"""Action naming/SQL helpers (workflow/action/ActionHelper.scala and
script/CmdScript.scala:splitCmdParameters).

Small pure functions shared by the SQL transformers (temp-view naming) and
the script action (command splitting) — extracted so the reference's
ActionHelperTest/CmdScriptTest scenarios map one-to-one.
"""

from __future__ import annotations

import re
import shlex

TEMP_VIEW_SUFFIX = "_sdltemp"


def replace_special_characters_with_underscore(name: str) -> str:
    """ActionHelper.replaceSpecialCharactersWithUnderscore: any character
    outside [A-Za-z0-9_] becomes '_' (legal Spark temp-view names)."""
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def create_temporary_view_name(name: str) -> str:
    """ActionHelper.createTemporaryViewName: sanitized name + '_sdltemp'."""
    return replace_special_characters_with_underscore(name) + TEMP_VIEW_SUFFIX


def replace_legacy_view_name(sql: str, view_name: str) -> str:
    """ActionHelper.replaceLegacyViewName: rewrite references to the LEGACY
    (un-suffixed) view name into the suffixed one — historic configs wrote
    `select * from src1`, the engine registers `src1_sdltemp`.

    Mirrors the reference pattern exactly (ActionHelper.scala:146-148):
    the name must be PRECEDED by a whitespace character (consumed, emitted
    as a single space — newlines collapse, exactly as the Scala
    replaceAll does) and FOLLOWED by whitespace, '.', or end-of-string
    (kept). A bare \\b on both sides would additionally rewrite qualified
    references like `db.src1` and occurrences inside string literals,
    which the reference does not (r8 ADVICE). Reference-faithful gap,
    kept deliberately: a legacy name followed by ',', ')' or ';' is NOT
    rewritten — the reference's own trailing class has the same hole, and
    this helper exists for parity with its historic-config behavior."""
    if not view_name.endswith(TEMP_VIEW_SUFFIX):
        return sql
    legacy = view_name[: -len(TEMP_VIEW_SUFFIX)]
    return re.sub(
        rf"\s{re.escape(legacy)}(\s|\.|$)", rf" {view_name}\1", sql
    )


def split_cmd_parameters(cmd: str) -> list[str]:
    """CmdScript.splitCmdParameters: shell-style tokenization where single-
    and double-quoted spans stay one parameter (quotes stripped)."""
    return shlex.split(cmd)
