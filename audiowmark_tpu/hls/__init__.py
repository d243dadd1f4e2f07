from .mpegts import TSReader, TSWriter  # noqa: F401
