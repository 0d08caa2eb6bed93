from . import aggregations
from .pipeline import start_records_stream, stream_rt_updates

__all__ = ["aggregations", "start_records_stream", "stream_rt_updates"]
