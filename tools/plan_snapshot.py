"""Golden-plan snapshot support: reduce an ``explain`` dump to a stable
operator-tree shape that can be committed and diffed.

PLANS.json's counters catch cartesians, unpushed scans, and window
placement, but two plans can hold every counter EQUAL while swapping a
BroadcastHashJoin for a SortMergeJoin or dropping a bucket-pruned scan —
the class of silent re-plan this snapshot layer exists to catch
(round-9 verdict item). ``normalize_plan`` keeps the tree structure and
operator names while stripping everything volatile: node ids, expression
ids, codegen stage ids, paths, statistics, and per-process artifact
tokens. ``SelectedBucketsCount`` markers are appended because bucket
pruning lives in node details, not the tree.

Works on both ``explain("formatted")`` (batch) and the simple-mode tree
``StreamingQuery.explain()`` prints.
"""

from __future__ import annotations

import re

# wetsa_postfull_sf0001_<hex12> and friends → stable family name (the
# family segment may itself contain underscores).
_TOKEN = re.compile(r"(wetsa_[a-z0-9_]+?)_[0-9a-f]{12}\b")
# EventTimeWatermark nodes print a per-run UUID.
_UUID = re.compile(
    r"\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\b"
)
_NODE_ID = re.compile(r"\s*\(\d+\)\s*$")
_CODEGEN = re.compile(r"^\*(\(\d+\))?\s*")


def _tree_line(raw: str) -> str | None:
    """One normalized tree line (indent structure + operator name), or
    None when the line is not part of the operator tree."""
    ln = raw.rstrip()
    if not ln.strip() or ln.lstrip().startswith("=="):
        return None
    m = re.match(r"^(?P<pre>[\s:+|-]*)(?P<rest>\S.*)$", ln)
    if m is None:
        return None
    pre, rest = m.group("pre"), m.group("rest")
    rest = _CODEGEN.sub("", rest)
    rest = _NODE_ID.sub("", rest)
    # Operator name = text before the first argument list; keep at most
    # three words so "Scan parquet <table>" stays informative.
    name = re.split(r"[([,]", rest, maxsplit=1)[0].strip()
    name = _TOKEN.sub(r"\1", name)
    name = _UUID.sub("", name).strip()
    name = " ".join(name.split()[:3])
    if not name:
        return None
    return f"{pre}{name}"


def normalize_plan(text: str) -> str:
    """Stable shape of an explain dump: the operator tree (first tree
    section only, so formatted mode's node-detail blocks are excluded)
    plus any bucket-pruning markers from the details."""
    lines: list[str] = []
    for raw in text.splitlines():
        ln = _tree_line(raw)
        if ln is None:
            if lines and not raw.strip():
                break  # end of the tree section (formatted mode)
            continue
        lines.append(ln)
    buckets = sorted(
        set(re.findall(r"SelectedBucketsCount: \d+ out of \d+", text))
    )
    return "\n".join(lines + buckets) + "\n"


def formatted_plan(df) -> str:
    """`explain("formatted")` output as a string."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
