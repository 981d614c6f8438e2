"""HDFS/posix ACL management — AclUtil parity.

The reference applies configured permissions + ACL entries to every path a
DataObject writes (`sdl-core/.../util/misc/AclUtil.scala`): overwrite the
permission and ACL spec on the target and everything BELOW it, extend
(modify, never overwrite) ACLs on parents UP to a configured minimum path
level, and refuse to touch paths that are too close to the filesystem root
(`hdfsAclsMinLevelPermissionOverwrite` / `...Modify`) or outside the
current user's base directory (`hdfsAclsLimitToBasedir`).

The rebuild separates PLANNING from APPLICATION: `plan_acl_ops` computes
the ordered operation list (with every safety guard of the reference), and
a pluggable applier executes it — `LocalAclApplier` (os.chmod for the
permission bits; the ACL spec goes to a `user.sdl.acl` xattr because POSIX
ACL syscalls are not in the stdlib), or `HadoopAclApplier` driving the JVM
FileSystem (setPermission / setAcl / modifyAclEntries) via the active
SparkSession for real HDFS deployments.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable

PERM_CHARS = "rwxrwxrwx"


@dataclass
class AclElement:
    """One ACL entry (AclElement.scala): e.g. type=group,
    name=t_datalake_application, permission=r-x."""

    acl_type: str
    name: str
    permission: str

    def get_acl_spec(self) -> str:
        return f"{self.acl_type}:{self.name}:{self.permission}"


@dataclass
class AclDef:
    """Permission string + ACL entries (AclDef.scala)."""

    permission: str
    acls: list[AclElement] = field(default_factory=list)

    @classmethod
    def from_config(cls, spec: dict[str, Any]) -> "AclDef":
        return cls(
            permission=spec["permission"],
            acls=[
                AclElement(e["aclType"], e["name"], e["permission"])
                for e in spec.get("acls", []) or []
            ],
        )

    def acl_spec(self) -> str:
        return ",".join(e.get_acl_spec() for e in self.acls)


def parse_permission(perm: str) -> int:
    """'rwxr-x---' -> 0o750 (AclUtil.readPermission)."""
    if len(perm) != 9:
        raise ValueError(f"permission must be 9 chars like 'rwxr-x---', got {perm!r}")
    mode = 0
    for i, (got, want) in enumerate(zip(perm, PERM_CHARS)):
        if got == want:
            mode |= 1 << (8 - i)
        elif got != "-":
            raise ValueError(f"invalid permission char {got!r} at position {i} in {perm!r}")
    return mode


def path_level(path: str) -> int:
    """Depth of a path: '/user/x/data' -> 3 (AclUtil.getPathLevel)."""
    return len([p for p in os.path.abspath(path).split(os.sep) if p])


def plan_acl_ops(
    path: str,
    min_level_permission_modify: int = 2,
    min_level_permission_overwrite: int = 3,
    basedir: str | None = None,
    list_children: Callable[[str], list[str]] | None = None,
) -> list[tuple[str, str]]:
    """Ordered (op, path) list implementing AclUtil.addACLs' traversal:

      1. ``overwrite`` on the target,
      2. ``overwrite`` on every descendant,
      3. ``modify`` on each parent up to (exclusive) the modify min level.

    Guards (all from the reference): the target must sit at or below
    ``min_level_permission_overwrite``; overwrite level must be >= modify
    level; with a ``basedir``, the target must live under it."""
    if min_level_permission_overwrite < min_level_permission_modify:
        raise ValueError(
            f"minLevelPermissionOverwrite ({min_level_permission_overwrite}) must be "
            f">= minLevelPermissionModify ({min_level_permission_modify})"
        )
    level = path_level(path)
    if level < min_level_permission_overwrite:
        raise ValueError(
            f"ACLs can't be overwritten on path {path!r}: level={level} < "
            f"minLevelPermissionOverwrite={min_level_permission_overwrite}"
        )
    if basedir is not None:
        base = os.path.abspath(basedir)
        target = os.path.abspath(path)
        if not (target + os.sep).startswith(base.rstrip(os.sep) + os.sep) and target != base:
            raise ValueError(f"path {path!r} is outside the ACL basedir {basedir!r}")
    ops: list[tuple[str, str]] = [("overwrite", path)]
    if list_children is not None:
        stack = [path]
        while stack:
            for child in list_children(stack.pop()):
                ops.append(("overwrite", child))
                stack.append(child)
    parent = os.path.dirname(os.path.abspath(path))
    while path_level(parent) >= min_level_permission_modify and parent not in ("", os.sep):
        ops.append(("modify", parent))
        parent = os.path.dirname(parent)
    return ops


class LocalAclApplier:
    """Apply the plan on a local filesystem: permission bits via chmod;
    the ACL spec is recorded in the ``user.sdl.acl`` xattr (POSIX ACL
    syscalls are not exposed by the stdlib; a deployment with the `setfacl`
    binary can swap this applier). ``modify`` never touches permission
    bits — parents only ever gain the ACL record, like the reference."""

    XATTR = b"user.sdl.acl"

    def __init__(self, acl_def: AclDef) -> None:
        self.acl_def = acl_def
        self.mode = parse_permission(acl_def.permission)

    def __call__(self, op: str, path: str) -> None:
        if not os.path.exists(path):
            return
        if op == "overwrite":
            os.chmod(path, self.mode)
        spec = self.acl_def.acl_spec().encode()
        if spec:
            try:
                os.setxattr(path, self.XATTR, spec)
            except OSError:
                pass  # filesystem without xattr support: permission-only


class HadoopAclApplier:
    """Apply the plan through the JVM Hadoop FileSystem of the active
    SparkSession (setPermission + setAcl for overwrite, modifyAclEntries
    for parents) — the real-HDFS path, py4j-gated like fs.py."""

    def __init__(self, spark: Any, acl_def: AclDef) -> None:
        self.spark = spark
        self.acl_def = acl_def
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(conf)
        self._permission = jvm.org.apache.hadoop.fs.permission.FsPermission(
            acl_def.permission.replace("-", "-")
        )
        spec = acl_def.acl_spec()
        self._entries = (
            jvm.org.apache.hadoop.fs.permission.AclEntry.parseAclSpec(spec, True)
            if spec
            else None
        )

    def __call__(self, op: str, path: str) -> None:
        jpath = self._jvm.org.apache.hadoop.fs.Path(path)
        if not self._fs.exists(jpath):
            return
        if op == "overwrite":
            self._fs.setPermission(jpath, self._permission)
            if self._entries is not None:
                self._fs.setAcl(jpath, self._entries)
        elif op == "modify" and self._entries is not None:
            self._fs.modifyAclEntries(jpath, self._entries)


def add_acls(
    acl_def: AclDef,
    path: str,
    applier: Callable[[str, str], None] | None = None,
    min_level_permission_modify: int = 2,
    min_level_permission_overwrite: int = 3,
    basedir: str | None = None,
) -> list[tuple[str, str]]:
    """AclUtil.addACLs: plan + apply; returns the executed plan. Descends
    into directories via os.walk-compatible listing for the local applier;
    a custom applier may pass its own listing through `plan_acl_ops`."""

    def _children(p: str) -> list[str]:
        if os.path.isdir(p):
            return [os.path.join(p, c) for c in sorted(os.listdir(p))]
        return []

    ops = plan_acl_ops(
        path,
        min_level_permission_modify=min_level_permission_modify,
        min_level_permission_overwrite=min_level_permission_overwrite,
        basedir=basedir,
        list_children=_children if os.path.exists(path) else None,
    )
    applier = applier or LocalAclApplier(acl_def)
    for op, p in ops:
        applier(op, p)
    return ops
