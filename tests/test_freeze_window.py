"""The freeze discipline as a suite gate (r10 verdict item 4): if a
FREEZE_r*.json exists, the current first-50 `queries()` key list and every
frozen member's oracle SQL must be byte-identical to what was frozen —
post-freeze edits to window members invalidate their driver rows and fail
the suite here instead of surfacing a round later."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_frozen_window_unchanged():
    import freeze_check

    path = freeze_check.newest_freeze_file()
    if path is None:
        return  # pre-freeze phase of a round: nothing to hold yet
    assert freeze_check.verify(path) == []
