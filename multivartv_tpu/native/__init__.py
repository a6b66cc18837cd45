from multivartv_tpu.native.loader import (
    available,
    nearest_kdtree,
    nearest_brute,
    bin_regular,
)
