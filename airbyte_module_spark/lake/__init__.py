from airbyte_module_spark.lake.table import LakeTable

__all__ = ["LakeTable"]
