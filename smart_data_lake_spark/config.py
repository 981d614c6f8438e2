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
        self.state_listeners: list[Any] = []  # GlobalConfig.stateListeners instances

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

    def data_object_ids_to_validate_on_read(self) -> list[str]:
        """DataObjects carrying expectations that NO registered action writes
        — pure sources, whose quality rules can only ever fire on read
        (InstanceRegistry.getDataObjectIdsToValidateOnRead,
        expectations/ValidateOnReadTest). Objects written by an action are
        validated with that action's write metrics instead."""
        written: set[str] = set()
        for a in self.actions.values():
            written.update(getattr(a, "output_ids", []) or [])
        return [
            do_id
            for do_id, do in self.data_objects.items()
            if getattr(do, "expectations", None) and do_id not in written
        ]

    def should_validate_data_object_on_read(self, do_id: str) -> bool:
        return do_id in self.data_object_ids_to_validate_on_read()

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
_CONN_TYPES: dict[str, type] = {}


def register_connection_type(cls: type) -> type:
    """Connection classes for the config's `connections` section
    (ConfigParser.scala's connections handling; e.g. JdbcConnection,
    KafkaConnection in the reference's dataobject/connection)."""
    _CONN_TYPES[cls.__name__] = cls
    return cls


# ------------------------------------------------------------------ secrets
# Reference: util/secrets/SecretsUtil.scala — config values written as
# "<PROVIDER>#<name>" resolve at load time. Built-ins CLEAR/ENV/FILE; custom
# providers register like the reference's SecretProvider plugins.

_SECRET_PROVIDERS: dict[str, Any] = {}


def global_spark_options(config: dict) -> dict[str, str]:
    """globalConfig.sparkOptions with secrets RESOLVED (GlobalConfig.scala:
    sparkOptions feed the session builder and, for spark.hadoop.* keys, the
    Hadoop configuration; secret tokens like ###ENV#NAME### resolve through
    the registered providers). Returns the plain resolved map — hand it to
    build_session(extra_conf=...) or apply_hadoop_options."""
    opts = (config.get("globalConfig", {}) or {}).get("sparkOptions", {}) or {}
    return {k: resolve_secret(str(v)) for k, v in opts.items()}


def apply_hadoop_options(spark, options: dict[str, str]) -> None:
    """Apply spark.hadoop.*-prefixed options onto the LIVE session's Hadoop
    configuration (mutable at runtime, unlike static Spark confs) —
    GlobalConfig.getHadoopConfiguration parity."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in options.items():
        if k.startswith("spark.hadoop."):
            hconf.set(k[len("spark.hadoop."):], v)


def register_secret_provider(name: str, fn) -> None:
    _SECRET_PROVIDERS[name.upper()] = fn


def resolve_secret(value: str) -> str:
    """Resolve one "PROVIDER#name" secret string; plain strings pass through.
    ENV# reads an environment variable, FILE# the stripped content of a file,
    CLEAR# is an explicit no-op marker (reference parity)."""
    import os

    if not isinstance(value, str) or "#" not in value:
        return value
    # the reference's StringOrSecret canonical form wraps the token as
    # ###PROVIDER#NAME### (SecretsUtil.scala); accept both the wrapped and
    # the bare PROVIDER#NAME spelling
    if value.startswith("###") and value.endswith("###") and len(value) > 6:
        value = value[3:-3]
    provider, _, name = value.partition("#")
    if provider == "CLEAR":
        return name
    if provider == "ENV":
        if name not in os.environ:
            raise ConfigError(f"secret env var {name!r} is not set")
        return os.environ[name]
    if provider == "FILE":
        if not os.path.isfile(name):
            raise ConfigError(f"secret file {name!r} does not exist")
        with open(name, "r", encoding="utf-8") as fh:
            return fh.read().strip()
    custom = _SECRET_PROVIDERS.get(provider.upper())
    if custom is not None:
        return custom(name)
    return value  # '#' in ordinary strings (paths, urls) is not a secret


def _resolve_secrets(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _resolve_secrets(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve_secrets(v) for v in obj]
    if isinstance(obj, str) and obj.partition("#")[0] in (
        {"CLEAR", "ENV", "FILE"} | set(_SECRET_PROVIDERS)
    ):
        return resolve_secret(obj)
    return obj


# ------------------------------------------------------------ substitution
# HOCON-style ${a.b.c} substitution against the config root, plus ${env.X}
# for environment variables — the subset of HOCON resolution the reference's
# configs actually use (templates in sdl-core test resources).

_SUBST_RE = None


def _substitute(config: dict[str, Any]) -> dict[str, Any]:
    import os
    import re

    pattern = re.compile(r"\$\{([^}]+)\}")

    def lookup(path: str, resolving: tuple[str, ...]) -> Any:
        if path.startswith("env."):
            name = path[4:]
            if name not in os.environ:
                raise ConfigError(f"substitution ${{env.{name}}}: env var not set")
            return os.environ[name]
        if path in resolving:
            raise ConfigError(f"substitution cycle at ${{{path}}}")
        node: Any = config
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                raise ConfigError(f"substitution ${{{path}}}: path not found")
            node = node[part]
        return resolve(node, resolving + (path,))

    def resolve(obj: Any, resolving: tuple[str, ...] = ()) -> Any:
        if isinstance(obj, dict):
            return {k: resolve(v, resolving) for k, v in obj.items()}
        if isinstance(obj, list):
            return [resolve(v, resolving) for v in obj]
        if isinstance(obj, str):
            full = pattern.fullmatch(obj)
            if full:  # whole-value reference keeps the referent's type
                return lookup(full.group(1), resolving)
            return pattern.sub(lambda m: str(lookup(m.group(1), resolving)), obj)
        return obj

    return resolve(config)


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
    # load the dataobjects package first: execution_modes -> dataobjects.base
    # -> dataobjects/__init__ -> kafka -> execution_modes is a cycle that
    # only resolves when dataobjects starts loading before execution_modes
    import smart_data_lake_spark.dataobjects  # noqa: F401
    import smart_data_lake_spark.auth_modes as am
    import smart_data_lake_spark.execution_modes as em
    import smart_data_lake_spark.housekeeping as hk
    import smart_data_lake_spark.expectations as exp
    import smart_data_lake_spark.transformers.df_transformers as dft
    import smart_data_lake_spark.transformers.dfs_transformers as dfst

    reg: dict[str, type] = {}
    for mod in (em, hk, dft, dfst, exp, am):
        for name in dir(mod):
            obj = getattr(mod, name)
            if isinstance(obj, type) and (
                name.endswith("Mode")
                or name.endswith("Transformer")
                or name.endswith("Expectation")
                or name == "Constraint"
            ):
                # abstract bases are not config types
                if name in ("AuthMode", "HttpHeaderAuth"):
                    continue
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
    # type registries populate via decorators at module import — make sure
    # the provider modules are loaded even when the caller imported only
    # config.py (e.g. metadata-only tools like dag_export)
    import smart_data_lake_spark.actions  # noqa: F401
    import smart_data_lake_spark.dataobjects  # noqa: F401

    config = _resolve_secrets(_substitute(config))
    registry = InstanceRegistry()
    # global UDF registration (GlobalConfig.sparkUDFs in the reference):
    # {"name": {"fn": callable | "module:function", "returnType": "int"}} —
    # registered into the session at DAG prepare so SQL transformers can call
    # them by name
    registry.spark_udfs = dict(config.get("globalConfig", {}).get("sparkUdfs", {}))
    # state listeners (GlobalConfig.stateListeners: [{className, options}]) —
    # notified by ActionDAGRun on every action-state change + final state
    listeners = []
    for spec in config.get("globalConfig", {}).get("stateListeners", []) or []:
        cls_name = spec.get("className") or spec.get("type")
        options = spec.get("options", {})
        if cls_name == "StateChangeLogger":
            from smart_data_lake_spark.azure import StateChangeLogger

            listeners.append(StateChangeLogger(options=options))
        elif cls_name == "FinalStateWriter":
            from smart_data_lake_spark.azure import FinalStateWriter

            listeners.append(FinalStateWriter(options=options))
        elif cls_name == "FinalMetricsLogWriter":
            from smart_data_lake_spark.azure import FinalMetricsLogWriter

            listeners.append(FinalMetricsLogWriter(options=options))
        elif cls_name == "StatusInfoServer":
            from smart_data_lake_spark.statusinfo import StatusInfoServer

            srv = StatusInfoServer(
                port=int(options.get("port", 4440)),
                max_port_retries=int(options.get("maxPortRetries", 10)),
            )
            srv.start()
            listeners.append(srv)
        elif cls_name and "." in cls_name:
            import importlib

            mod_name, _, attr = cls_name.rpartition(".")
            listeners.append(getattr(importlib.import_module(mod_name), attr)(options=options))
        else:
            raise ConfigError(f"unknown state listener className {cls_name!r}")
    # UI backend (GlobalConfig.uiBackend -> StateUploader): ships run states
    # to the SDLB UI's REST API with staged retry on outages
    ui_backend = config.get("globalConfig", {}).get("uiBackend")
    if ui_backend:
        from smart_data_lake_spark.uploader import ui_backend_from_config

        listeners.append(ui_backend_from_config(ui_backend))
    registry.state_listeners = listeners
    # memory log timer (GlobalConfig.memoryLogTimer) — periodic process/proc/
    # cgroup memory logging; stop via registry.memory_log_timer.stop()
    mem_spec = config.get("globalConfig", {}).get("memoryLogTimer")
    if mem_spec:
        from smart_data_lake_spark.apputil import MemoryLogTimer

        registry.memory_log_timer = MemoryLogTimer.from_config(mem_spec)
        registry.memory_log_timer.start()
    # SDL plugin hook (GlobalConfig.sdlPluginClassName + pluginOptions):
    # configure() fires here at config parse; the CLI calls startup() before
    # loading and shutdown() on ordinary exit
    plugin_cls = config.get("globalConfig", {}).get("sdlPluginClassName")
    if plugin_cls:
        from smart_data_lake_spark.apputil import load_sdl_plugin

        registry.sdl_plugin = load_sdl_plugin(plugin_cls)
        registry.sdl_plugin.configure(
            config.get("globalConfig", {}).get("pluginOptions", {}) or {}
        )
    for conn_id, spec in (config.get("connections") or {}).items():
        spec = dict(spec)
        type_name = spec.pop("type", None)
        cls = _CONN_TYPES.get(type_name)
        if cls is None:
            raise ConfigError(f"unknown Connection type {type_name!r} for id {conn_id!r}")
        registry.register_connection(conn_id, cls(id=conn_id, **_snake_kwargs(spec)))
    for do_id, spec in (config.get("dataObjects") or {}).items():
        spec = dict(spec)
        type_name = spec.pop("type", None)
        cls = _DO_TYPES.get(type_name)
        if cls is None:
            raise ConfigError(f"unknown DataObject type {type_name!r} for id {do_id!r}")
        conn_id = spec.pop("connectionId", None)
        if conn_id is not None:
            if conn_id not in registry.connections:
                raise ConfigError(f"unknown connectionId {conn_id!r} for DataObject {do_id!r}")
            spec["connection"] = registry.connections[conn_id]
        spec = {k: _instantiate_nested(v) for k, v in spec.items()}
        registry.register_data_object(cls(id=do_id, **_snake_kwargs(spec)))
    # agents section (JettyAgent.scala:27 declarations)
    agents: dict[str, Any] = {}
    if config.get("agents"):
        from smart_data_lake_spark.agents import HttpAgent

        for agent_id, spec in config["agents"].items():
            spec = dict(spec)
            type_name = spec.pop("type", "HttpAgent")
            if type_name == "HttpAgent":
                agents[agent_id] = HttpAgent(id=agent_id, **_snake_kwargs(spec))
            elif type_name == "AzureRelayAgent":
                from smart_data_lake_spark.relay_agent import AzureRelayAgent

                agents[agent_id] = AzureRelayAgent(id=agent_id, **_snake_kwargs(spec))
            elif type_name in ("WebSocketAgent", "JettyAgent"):
                # JettyAgent is the reference's name for the direct-websocket
                # agent endpoint (workflow/agent/JettyAgent.scala:27)
                from smart_data_lake_spark.relay_agent import WebSocketAgent

                agents[agent_id] = WebSocketAgent(id=agent_id, **_snake_kwargs(spec))
            else:
                raise ConfigError(f"unknown Agent type {type_name!r} for id {agent_id!r}")
    for action_id, spec in (config.get("actions") or {}).items():
        spec = dict(spec)
        type_name = spec.pop("type", None)
        agent_id = spec.pop("agentId", None)
        if agent_id is not None:
            # reference behavior: an action with an agent is wrapped into a
            # ProxyAction carrying the config fragment the remote needs
            # (ProxyAction.scala + AgentClient.prepareHoconInstructions)
            from smart_data_lake_spark.agents import ProxyAction

            if agent_id not in agents:
                raise ConfigError(f"unknown agentId {agent_id!r} for action {action_id!r}")
            in_ids = [spec.get("inputId")] if spec.get("inputId") else list(spec.get("inputIds", []))
            out_ids = [spec.get("outputId")] if spec.get("outputId") else list(spec.get("outputIds", []))
            do_ids = [d for d in in_ids + out_ids if d]
            fragment = {
                "connections": dict(config.get("connections") or {}),
                "dataObjects": {d: config["dataObjects"][d] for d in do_ids},
                "actions": {action_id: {**spec, "type": type_name}},
            }
            ProxyAction(
                id=action_id,
                agent=agents[agent_id],
                remote_config=fragment,
                input_ids=[d for d in in_ids if d],
                output_ids=[d for d in out_ids if d],
                registry=registry,
            )
            continue
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
