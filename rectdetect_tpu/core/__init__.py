from rectdetect_tpu.core import color  # noqa: F401
