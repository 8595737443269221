from dbt_foundation_spark.sources.registry import (  # noqa: F401
    Source,
    SourceRegistry,
    testdata_sources,
)
