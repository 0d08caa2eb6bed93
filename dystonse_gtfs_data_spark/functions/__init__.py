from . import delays, geo, route, text, time

__all__ = ["delays", "geo", "route", "text", "time"]
