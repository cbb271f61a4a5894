from pipelinewise_spark.streaming.monitor import (  # noqa: F401
    running_conv_stats,
    windowed_change_rates,
)
