from airbyte_module_spark.streaming.pipeline import CdcPipeline

__all__ = ["CdcPipeline"]
