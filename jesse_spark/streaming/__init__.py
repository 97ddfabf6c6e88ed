from jesse_spark.streaming.stateful import (
    violation_streaks,
    violation_streaks_batch,
)
from jesse_spark.streaming.validate_stream import (
    streaming_verdicts,
    validate_stream,
)

__all__ = ["validate_stream", "streaming_verdicts", "violation_streaks",
           "violation_streaks_batch"]
