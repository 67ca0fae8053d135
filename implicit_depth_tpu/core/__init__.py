from implicit_depth_tpu.core import geometry, sampling  # noqa: F401
