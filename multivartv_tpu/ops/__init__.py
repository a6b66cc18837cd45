from multivartv_tpu.ops import diff, dct, interp, prox
