from .encode_stream import (dedup_stream, encode_stream,  # noqa: F401
                            windowed_event_counts)
