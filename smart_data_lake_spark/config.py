"""Instance registry + config loading.

Reference: `config/InstanceRegistry.scala` (id → instance registry) and
`config/ConfigParser.scala:44-115` (HOCON sections global/connections/
dataObjects/actions). The rebuild accepts plain Python dicts (JSON/YAML-ready)
with a `type` discriminator, or direct programmatic registration.
"""

from __future__ import annotations

from typing import Any, TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from smart_data_lake_spark.actions.base import Action
    from smart_data_lake_spark.dataobjects.base import DataObject


class ConfigError(Exception):
    pass


class InstanceRegistry:
    """id → instance registry for data objects, actions and connections."""

    def __init__(self) -> None:
        self.data_objects: dict[str, "DataObject"] = {}
        self.actions: dict[str, "Action"] = {}
        self.connections: dict[str, Any] = {}
        self.spark_udfs: dict[str, Any] = {}  # name → {"fn": ..., "returnType": ...}

    def register_spark_udfs(self, spark) -> None:
        """Register configured UDFs into the session (GlobalConfig.sparkUDFs)
        — SQL transformers can then call them by name. Python UDFs are the
        slow path; these are for config-driven edge logic, not hot loops."""
        for name, spec in self.spark_udfs.items():
            fn = spec["fn"] if isinstance(spec, dict) else spec
            return_type = spec.get("returnType") if isinstance(spec, dict) else None
            if isinstance(fn, str):
                mod, _, attr = fn.partition(":")
                import importlib

                fn = getattr(importlib.import_module(mod), attr)
            spark.udf.register(name, fn, return_type)

    def register_data_object(self, do: "DataObject") -> "DataObject":
        if do.id in self.data_objects:
            raise ConfigError(f"duplicate DataObject id {do.id!r}")
        self.data_objects[do.id] = do
        return do

    def register_action(self, action: "Action") -> "Action":
        if action.id in self.actions:
            raise ConfigError(f"duplicate Action id {action.id!r}")
        self.actions[action.id] = action
        return action

    def register_connection(self, conn_id: str, conn: Any) -> Any:
        self.connections[conn_id] = conn
        return conn

    def get_data_object(self, do_id: str) -> "DataObject":
        try:
            return self.data_objects[do_id]
        except KeyError:
            raise ConfigError(f"unknown DataObject id {do_id!r}") from None

    def get_action(self, action_id: str) -> "Action":
        try:
            return self.actions[action_id]
        except KeyError:
            raise ConfigError(f"unknown Action id {action_id!r}") from None


_DO_TYPES: dict[str, type] = {}
_ACTION_TYPES: dict[str, type] = {}


def register_data_object_type(cls: type) -> type:
    """Class decorator mapping `type: ClassName` config entries to classes
    (the rebuild's FromConfigFactory, ConfigParser.scala:44-115)."""
    _DO_TYPES[cls.__name__] = cls
    return cls


def register_action_type(cls: type) -> type:
    _ACTION_TYPES[cls.__name__] = cls
    return cls


# nested config types: execution modes, transformers, housekeeping modes —
# resolved lazily so config.py has no import cycle with those modules
def _nested_type_registry() -> dict[str, type]:
    import smart_data_lake_spark.execution_modes as em
    import smart_data_lake_spark.housekeeping as hk
    import smart_data_lake_spark.expectations as exp
    import smart_data_lake_spark.transformers.df_transformers as dft
    import smart_data_lake_spark.transformers.dfs_transformers as dfst

    reg: dict[str, type] = {}
    for mod in (em, hk, dft, dfst, exp):
        for name in dir(mod):
            obj = getattr(mod, name)
            if isinstance(obj, type) and (
                name.endswith("Mode")
                or name.endswith("Transformer")
                or name.endswith("Expectation")
                or name == "Constraint"
            ):
                reg[name] = obj
    return reg


def _instantiate_nested(value: Any) -> Any:
    """Recursively turn {"type": "PartitionDiffMode", ...} specs inside
    action configs into instances (ConfigParser nested-object reflection)."""
    if isinstance(value, dict) and "type" in value:
        spec = dict(value)
        type_name = spec.pop("type")
        cls = _nested_type_registry().get(type_name)
        if cls is None:
            raise ConfigError(f"unknown nested config type {type_name!r}")
        return cls(**_snake_kwargs({k: _instantiate_nested(v) for k, v in spec.items()}))
    if isinstance(value, list):
        return [_instantiate_nested(v) for v in value]
    return value


def load_config(config: dict[str, Any]) -> InstanceRegistry:
    """Build an InstanceRegistry from a plain dict.

    Shape (mirrors the reference's HOCON sections)::

        {"dataObjects": {"src": {"type": "ParquetFileDataObject", "path": ...}},
         "actions": {"a": {"type": "CopyAction", "inputId": "src", ...}}}
    """
    registry = InstanceRegistry()
    # global UDF registration (GlobalConfig.sparkUDFs in the reference):
    # {"name": {"fn": callable | "module:function", "returnType": "int"}} —
    # registered into the session at DAG prepare so SQL transformers can call
    # them by name
    registry.spark_udfs = dict(config.get("globalConfig", {}).get("sparkUdfs", {}))
    for do_id, spec in (config.get("dataObjects") or {}).items():
        spec = dict(spec)
        type_name = spec.pop("type", None)
        cls = _DO_TYPES.get(type_name)
        if cls is None:
            raise ConfigError(f"unknown DataObject type {type_name!r} for id {do_id!r}")
        spec = {k: _instantiate_nested(v) for k, v in spec.items()}
        registry.register_data_object(cls(id=do_id, **_snake_kwargs(spec)))
    for action_id, spec in (config.get("actions") or {}).items():
        spec = dict(spec)
        type_name = spec.pop("type", None)
        cls = _ACTION_TYPES.get(type_name)
        if cls is None:
            raise ConfigError(f"unknown Action type {type_name!r} for id {action_id!r}")
        spec = {k: _instantiate_nested(v) for k, v in spec.items()}
        action = cls(id=action_id, registry=registry, **_snake_kwargs(spec))
        if action_id not in registry.actions:
            registry.register_action(action)
    return registry


def _snake_kwargs(spec: dict[str, Any]) -> dict[str, Any]:
    """camelCase config keys → snake_case python kwargs."""
    import re

    def snake(name: str) -> str:
        return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()

    return {snake(k): v for k, v in spec.items()}
