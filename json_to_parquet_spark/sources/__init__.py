from .webpages import synth_webpages  # noqa: F401
