from jesse_spark.streaming.validate_stream import validate_stream, streaming_verdicts

__all__ = ["validate_stream", "streaming_verdicts"]
