from .sources import STREAM_EVENT_SCHEMA, read_event_stream, read_json_event_stream  # noqa: F401
from .sliding_agg import sliding_agg_exact, sliding_agg_windowed  # noqa: F401
from .upsert_sink import start_stream_upsert  # noqa: F401
