"""SURVEY.md §2 operator inventory. Modules register into the registry
on import; logdb_spark.registry._OPERATOR_MODULES is the module list."""
