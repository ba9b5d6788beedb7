from .compat import date_add_unit, date_diff_unit, date_format_trino, split_part
from .decimals import dec, exact_avg, exact_sum, pct_of, safe_ratio
from .geo import haversine_km
from .keys import record_hash, surrogate_key
from .masking import mask_email, mask_name, mask_phone

__all__ = [
    "date_add_unit",
    "date_diff_unit",
    "date_format_trino",
    "split_part",
    "dec",
    "exact_avg",
    "exact_sum",
    "pct_of",
    "safe_ratio",
    "haversine_km",
    "record_hash",
    "surrogate_key",
    "mask_email",
    "mask_name",
    "mask_phone",
]
