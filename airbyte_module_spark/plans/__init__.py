from airbyte_module_spark.plans.lineage import BatchLineage, lineage_from_batch

__all__ = ["BatchLineage", "lineage_from_batch"]
