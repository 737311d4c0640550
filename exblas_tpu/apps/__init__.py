"""Strong-reproducibility application studies.

TPU re-creations of the fork's application suite (reference
src/{cpu,gpu}/examples/*/StrongReproducibility): each app has a
*non-reproducible* floating-point path and a *reproducible* path whose
accumulations go through the exact superaccumulator routines, and an
experiment harness that re-runs the app with shuffled data / randomized
partitions and checks bitwise equality across repeats (the control path is
expected to fail this, demonstrating the experiment's sensitivity --
reference RNGExample.cpp:269-334).
"""

from .rng_sum import rng_sum_experiment
from .kmeans import kmeans_experiment
from .spmv import spmv_experiment
from .gridding import gridding_experiment

__all__ = [
    "rng_sum_experiment",
    "kmeans_experiment",
    "spmv_experiment",
    "gridding_experiment",
]
