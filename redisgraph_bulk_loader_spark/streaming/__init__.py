from .stream import (  # noqa: F401
    incremental_graph_update,
    sessionize_events,
    stream_events_to_graph,
    windowed_event_counts,
)
from .stateful import sessionize_stream  # noqa: F401
