from datax_spark.datagen.generator import (  # noqa: F401
    EventLogSpec,
    generate_event_log,
    reference_apply,
)
