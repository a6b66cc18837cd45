from multivartv_tpu.utils.metrics import mse
