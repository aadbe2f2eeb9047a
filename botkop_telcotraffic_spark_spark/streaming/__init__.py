from . import json_stream, pipeline, runner, upsert_join

__all__ = ["json_stream", "pipeline", "runner", "upsert_join"]
