from smart_data_lake_spark.plans.dag import ActionDAG, ActionDAGRun, RunState
from smart_data_lake_spark.plans.app import SmartDataLakeBuilder

__all__ = ["ActionDAG", "ActionDAGRun", "RunState", "SmartDataLakeBuilder"]
