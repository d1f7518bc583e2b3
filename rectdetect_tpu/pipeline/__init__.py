from rectdetect_tpu.pipeline.poly import poly_frame  # noqa: F401
from rectdetect_tpu.pipeline.rect import rect_frame, RectResult  # noqa: F401
