"""Config JSON-schema exporter.

    python tools/config_schema.py [-o schema.json]

Reference: `sdl-lang/.../meta/jsonschema/JsonSchemaExporter.scala` — the
reference introspects its case classes and emits a JSON schema of the whole
HOCON config surface (driving the VS Code editor's completion/validation).
This rebuild introspects the SAME registries `load_config` instantiates from
(`_DO_TYPES`, `_ACTION_TYPES`, `_CONN_TYPES`, plus the nested
transformer/execution-mode/expectation registry) via `inspect.signature`, so
the schema can never drift from what the loader actually accepts: every
constructor parameter appears camelCased (the loader snake-cases on the way
in), defaults mark optionality, and annotations map to JSON types.
"""

from __future__ import annotations

import argparse
import inspect
import json
import re
import sys

sys.path.insert(0, "/root/repo")


_TYPE_MAP = {
    "str": {"type": "string"},
    "int": {"type": "integer"},
    "float": {"type": "number"},
    "bool": {"type": "boolean"},
    "dict": {"type": "object"},
    "list": {"type": "array"},
}


def _camel(name: str) -> str:
    parts = name.split("_")
    return parts[0] + "".join(p.title() for p in parts[1:])


def _ann_schema(annotation: str) -> dict:
    # annotations arrive as strings (from __future__ annotations); pick the
    # first concrete type mentioned, permissive fallback = {}
    ann = annotation.replace(" ", "")
    for key, js in _TYPE_MAP.items():
        if re.match(rf"^{key}\b", ann) or f"|{key}" in ann or ann.startswith(f"{key}["):
            return dict(js)
    if "dict" in ann:
        return {"type": "object"}
    if "list" in ann:
        return {"type": "array"}
    return {}


def _class_schema(name: str, cls: type, skip_params=("self", "registry", "kwargs")) -> dict:
    props: dict[str, dict] = {"type": {"const": name}}
    required = ["type"]
    try:
        sig = inspect.signature(cls.__init__)
    except (TypeError, ValueError):
        return {"type": "object", "properties": props, "required": required}
    for pname, p in sig.parameters.items():
        if pname in skip_params or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        entry = _ann_schema(str(p.annotation)) if p.annotation is not p.empty else {}
        if p.default is not p.empty and p.default is not None and not callable(p.default):
            try:
                json.dumps(p.default)
                entry["default"] = p.default if not hasattr(p.default, "value") else p.default.value
            except TypeError:
                pass
        cname = _camel(pname)
        props[cname] = entry
        if p.default is p.empty and pname != "id":
            required.append(cname)
    doc = inspect.getdoc(cls)
    out = {"type": "object", "properties": props, "required": required,
           "additionalProperties": True}
    if doc:
        out["description"] = doc.split("\n")[0][:200]
    return out


def build_schema(version: str = "r5") -> dict:
    # import the package so every @register_* decorator has run
    import smart_data_lake_spark.dataobjects  # noqa: F401
    import smart_data_lake_spark.actions  # noqa: F401
    from smart_data_lake_spark.agents import HttpAgent
    from smart_data_lake_spark.config import (
        _ACTION_TYPES,
        _CONN_TYPES,
        _DO_TYPES,
        _nested_type_registry,
    )

    def section(types: dict[str, type]) -> dict:
        return {
            "type": "object",
            "additionalProperties": {
                "oneOf": [_class_schema(n, c) for n, c in sorted(types.items())]
            },
        }

    nested = _nested_type_registry()
    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": f"smart_data_lake_spark config (version {version})",
        "type": "object",
        "properties": {
            "globalConfig": {"type": "object"},
            "connections": section(_CONN_TYPES),
            "dataObjects": section(_DO_TYPES),
            "actions": section(_ACTION_TYPES),
            "agents": section({"HttpAgent": HttpAgent}),
        },
        "definitions": {
            "nestedTypes": {
                "oneOf": [_class_schema(n, c) for n, c in sorted(nested.items())]
            }
        },
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--version", default="r5")
    args = ap.parse_args()
    schema = build_schema(args.version)
    text = json.dumps(schema, indent=2)
    if args.output:
        with open(args.output, "w", encoding="utf-8") as fh:
            fh.write(text)
        counts = {k: len(schema["properties"][k]["additionalProperties"]["oneOf"])
                  for k in ("dataObjects", "actions", "connections")}
        print(f"wrote {args.output}: {counts} + "
              f"{len(schema['definitions']['nestedTypes']['oneOf'])} nested types")
    else:
        print(text)
