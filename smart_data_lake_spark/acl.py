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


def split_uri(path: str) -> tuple[str, str]:
    """('hdfs://nn', '/user/x') for URIs; ('', abspath) for local paths —
    level computation and the parent walk operate on the PATH PART only
    (os.path.abspath on an URI would prefix the CWD and corrupt both)."""
    if "://" in path:
        scheme_auth, _, rest = path.partition("://")
        authority, sep, p = rest.partition("/")
        return f"{scheme_auth}://{authority}", ("/" + p if sep else "/")
    return "", os.path.abspath(path)


def path_level(path: str) -> int:
    """Depth of a path: '/user/x/data' -> 3, also for URIs
    (AclUtil.getPathLevel)."""
    _, p = split_uri(path)
    return len([seg for seg in p.split("/") if seg])


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
    prefix, pure = split_uri(path)
    if basedir is not None:
        b_prefix, b_pure = split_uri(basedir)
        if b_prefix != prefix or not (
            (pure + "/").startswith(b_pure.rstrip("/") + "/") or pure == b_pure
        ):
            raise ValueError(f"path {path!r} is outside the ACL basedir {basedir!r}")
    ops: list[tuple[str, str]] = [("overwrite", path)]
    if list_children is not None:
        stack = [path]
        while stack:
            for child in list_children(stack.pop()):
                ops.append(("overwrite", child))
                stack.append(child)
    parent = pure.rsplit("/", 1)[0] or "/"
    while path_level(prefix + parent) >= min_level_permission_modify and parent != "/":
        ops.append(("modify", prefix + parent))
        parent = parent.rsplit("/", 1)[0] or "/"
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
        # FsPermission(String) parses octal/umask forms only; the ls-style
        # 9-char spec needs valueOf with a leading file-type character
        self._permission = jvm.org.apache.hadoop.fs.permission.FsPermission.valueOf(
            "-" + acl_def.permission
        )
        spec = acl_def.acl_spec()
        self._entries = (
            jvm.org.apache.hadoop.fs.permission.AclEntry.parseAclSpec(spec, True)
            if spec
            else None
        )

    def list_children(self, path: str) -> list[str]:
        """Descendant listing through the JVM FileSystem, so the plan's
        overwrite-everything-below contract holds on remote schemes where
        os.listdir cannot see the files."""
        jpath = self._jvm.org.apache.hadoop.fs.Path(path)
        if not self._fs.exists(jpath) or not self._fs.getFileStatus(jpath).isDirectory():
            return []
        return [
            st.getPath().toString() for st in self._fs.listStatus(jpath)
        ]

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

    def _local_children(p: str) -> list[str]:
        if os.path.isdir(p):
            return [os.path.join(p, c) for c in sorted(os.listdir(p))]
        return []

    applier = applier or LocalAclApplier(acl_def)
    if hasattr(applier, "list_children"):
        lister = applier.list_children  # remote scheme: JVM FileSystem listing
    elif os.path.exists(path):
        lister = _local_children
    else:
        lister = None
    ops = plan_acl_ops(
        path,
        min_level_permission_modify=min_level_permission_modify,
        min_level_permission_overwrite=min_level_permission_overwrite,
        basedir=basedir,
        list_children=lister,
    )
    for op, p in ops:
        applier(op, p)
    return ops


def parent(path: str) -> str | None:
    """Parent directory, None at the root — scheme/authority preserved
    (AclUtil.parent). Wildcards in the LAST element are just another
    segment: the parent strips them like any name."""
    prefix, p = split_uri(path)
    p = p.rstrip("/") or "/"
    if p == "/":
        return None
    head = p.rsplit("/", 1)[0] or "/"
    return f"{prefix}{head}" if prefix else head


def exists_with_wildcard(path: str) -> bool:
    """Existence check honoring glob wildcards in the path
    (AclUtil.exists over a globbed listing)."""
    import glob as _glob

    return bool(_glob.glob(path)) if any(ch in path for ch in "*?[") else os.path.exists(path)


def traverse_directory_up(path: str, stop_level: int, fn) -> str:
    """Walk parents applying ``fn`` to each until (exclusive) a path of
    ``stop_level`` is reached; returns that stop-level ancestor
    (AclUtil.traverseDirectoryUp)."""
    current = path
    while path_level(current) > stop_level:
        up = parent(current)
        if up is None:
            break
        current = up
        if path_level(current) > stop_level:
            fn(current)
    return current


def extract_path_level(path: str, level: int) -> str:
    """The path SEGMENT at 1-based ``level`` — e.g. level 2 of
    '/user/app_dir/x' is 'app_dir', the user-home name
    (AclUtil.extractPathLevel). Too-shallow paths are an error."""
    _, p = split_uri(path)
    segs = [s for s in p.split("/") if s]
    if len(segs) < level:
        raise ValueError(f"path {path!r} has no level-{level} segment")
    return segs[level - 1]


def check_basedir_path(user_home: str, path: str, basedir: str | None = None) -> None:
    """Guard ACL changes to the configured scope: without a basedir the
    path's user-home segment (level 2) must equal ``user_home``; with one,
    the path must live under the basedir (AclUtil.checkBasedirPath)."""
    if basedir is not None:
        b_prefix, b_pure = split_uri(basedir)
        _, p_pure = split_uri(path)
        if not (p_pure == b_pure or p_pure.startswith(b_pure.rstrip("/") + "/")):
            raise ValueError(f"path {path!r} is outside the ACL basedir {basedir!r}")
        return
    actual = extract_path_level(path, 2)
    if actual != user_home:
        raise ValueError(
            f"path {path!r} belongs to user home {actual!r}, not {user_home!r}"
        )
