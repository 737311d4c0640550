from .types import (
    AccFormat,
    DOT_FORMAT,
    LIMB_BASE,
    LIMB_BITS,
    LIMB_MASK,
    L_DOT,
    L_SUM,
    SUM_FORMAT,
    Superacc,
)
from .ieee import F64Bits, decode_fields, join_f64, split_f64
from .rounding import (
    f64_bits_to_hi_lo,
    ieee_encode_round,
    round_superacc_to_f64_bits,
)

__all__ = [
    "AccFormat",
    "DOT_FORMAT",
    "F64Bits",
    "LIMB_BASE",
    "LIMB_BITS",
    "LIMB_MASK",
    "L_DOT",
    "L_SUM",
    "SUM_FORMAT",
    "Superacc",
    "decode_fields",
    "f64_bits_to_hi_lo",
    "ieee_encode_round",
    "join_f64",
    "round_superacc_to_f64_bits",
    "split_f64",
]
