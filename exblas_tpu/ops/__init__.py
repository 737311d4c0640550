from .exsum import exsum, exsum_acc, exsum_bits, exsum_segmented
from .exdot import exdot, exdot_acc, exdot_bits
from .exgemv import exgemv
from .exgemm import exgemm
from .extrsv import extrsv

__all__ = [
    "exsum", "exsum_acc", "exsum_bits", "exsum_segmented",
    "exdot", "exdot_acc", "exdot_bits",
    "exgemv", "exgemm", "extrsv",
]
