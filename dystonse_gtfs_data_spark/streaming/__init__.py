from .pipeline import start_records_stream, stream_rt_updates

__all__ = ["start_records_stream", "stream_rt_updates"]
