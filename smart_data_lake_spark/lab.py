"""Notebook/Lab facade — ergonomic interactive access to a configured lake.

Reference: `sdl-lang/.../lab/SmartDataLakeBuilderLab.scala:47` — a wrapper
exposing data objects and actions of a parsed config as attribute-style
accessors for notebook exploration:

    lab = SmartDataLakeLab(config={...})           # or registry=...
    lab.data_objects["stg_orders"].df()            # read as DataFrame
    lab.data_objects["stg_orders"].df({"month": "2024-01"})
    lab.data_objects["stg_orders"].schema()
    lab.data_objects["stg_orders"].partitions()
    lab.data_objects["stg_orders"].write(df)       # guarded, see writes_enabled
    lab.actions["copy_orders"].run()               # execute one action's DAG
    lab.run(feed_sel="staging*")                   # run a feed selection

Writes are disabled by default (`SmartDataLakeBuilderLab.scala`'s
writingAllowed guard) — notebooks explore; pipelines write.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from smart_data_lake_spark.config import InstanceRegistry, load_config
from smart_data_lake_spark.dataobjects.base import CanCreateDataFrame, CanWriteDataFrame
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.plans.app import SmartDataLakeBuilder
from smart_data_lake_spark.plans.dag import ActionDAG, ActionDAGRun, RunState
from smart_data_lake_spark.session import get_session


class LabDataObjectWrapper:
    def __init__(self, do, lab: "SmartDataLakeLab") -> None:
        self._do = do
        self._lab = lab

    @property
    def raw(self):
        """The underlying DataObject instance."""
        return self._do

    def df(self, partition_values: dict | list[dict] | None = None) -> DataFrame:
        if not isinstance(self._do, CanCreateDataFrame):
            raise TypeError(f"({self._do.id}) does not produce DataFrames")
        pvs = None
        if partition_values:
            if isinstance(partition_values, dict):
                partition_values = [partition_values]
            pvs = [PartitionValues.of(d) for d in partition_values]
        return self._do.get_dataframe(self._lab.spark, pvs)

    def schema(self):
        return self.df().schema

    def partitions(self) -> list[dict]:
        if hasattr(self._do, "list_partitions"):
            return [pv.as_dict for pv in self._do.list_partitions(self._lab.spark)]
        return []

    def write(self, df: DataFrame, **kwargs: Any) -> dict:
        if not self._lab.writes_enabled:
            raise PermissionError(
                f"({self._do.id}) lab writes are disabled — construct the lab "
                "with writes_enabled=True to allow them"
            )
        if not isinstance(self._do, CanWriteDataFrame):
            raise TypeError(f"({self._do.id}) is not writable")
        return self._do.write_dataframe(df, **kwargs)


class LabActionWrapper:
    def __init__(self, action, lab: "SmartDataLakeLab") -> None:
        self._action = action
        self._lab = lab

    @property
    def raw(self):
        return self._action

    def run(self) -> RunState:
        """Execute just this action (its own one-node DAG)."""
        if not self._lab.writes_enabled:
            raise PermissionError(
                f"({self._action.id}) running actions writes outputs — construct "
                "the lab with writes_enabled=True"
            )
        run = ActionDAGRun(ActionDAG([self._action]), self._lab.registry)
        return run.run(self._lab.spark)

    def simulate(self, input_dfs: dict[str, DataFrame]) -> dict[str, DataFrame]:
        """Init-phase transform with injected inputs; no storage touched."""
        builder = SmartDataLakeBuilder(self._lab.registry)
        return builder.simulate(input_dfs, feed_sel=f"ids:{self._action.id}", spark=self._lab.spark)


class _Accessor:
    """dict-like with attribute access and tab-completion support."""

    def __init__(self, items: dict[str, Any]) -> None:
        self._items = items

    def __getitem__(self, key: str):
        if key not in self._items:
            raise KeyError(f"{key!r} not found; known: {sorted(self._items)}")
        return self._items[key]

    def __getattr__(self, key: str):
        try:
            return self._items[key]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(key) from e

    def __dir__(self):
        return list(self._items)

    def __iter__(self):
        return iter(self._items)

    def keys(self):
        return self._items.keys()


class SmartDataLakeLab:
    def __init__(
        self,
        registry: InstanceRegistry | None = None,
        config: dict[str, Any] | None = None,
        spark: SparkSession | None = None,
        writes_enabled: bool = False,
    ) -> None:
        if registry is None and config is not None:
            registry = load_config(config)
        self.registry = registry or InstanceRegistry()
        self.spark = spark or get_session()
        self.writes_enabled = writes_enabled
        self.data_objects = _Accessor(
            {do_id: LabDataObjectWrapper(do, self) for do_id, do in self.registry.data_objects.items()}
        )
        self.actions = _Accessor(
            {a_id: LabActionWrapper(a, self) for a_id, a in self.registry.actions.items()}
        )

    def run(self, feed_sel: str | None = None, **kwargs: Any) -> RunState:
        if not self.writes_enabled:
            raise PermissionError("lab writes are disabled — writes_enabled=True to run pipelines")
        return SmartDataLakeBuilder(self.registry).run(feed_sel, spark=self.spark, **kwargs)
