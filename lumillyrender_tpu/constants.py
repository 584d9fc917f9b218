"""Global constants shared by every kernel.

Parity: reference `src/constant.rs:1-3`. EPS is load-bearing: it is both the
ray-t cutoff used by every primitive intersector and the shadow-ray distance
tolerance, so self-intersection behavior (and therefore images) depend on it.
"""

PI = 3.14159265358979323846264338327950288
EPS = 1e-3
INF = 1e5
