"""Manifest data model — one canonical schema for the reference's IR.

The reference emits ``{"commands": [...]}`` (run_annotate.py:314-319) but
ships a JSON-Schema describing an older ``{files, columns}`` shape
(manifest.schema.json — a real drift bug, SURVEY.md §5). We define ONE
canonical dataclass model matching what run_annotate actually emits
(run_annotate.py:187-197, 226-234), with a loader that also migrates the
older shape.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ColumnSpec:
    """Dictionary-resolved column: source name + display metadata
    (run_annotate.py:183-184; fields.json entries {col, name, desc})."""

    col: str
    name: str = ""
    desc: str = ""


@dataclass(frozen=True)
class MeltSpec:
    """Wide→long spec (run_annotate.py:202-211): the key/value column
    names+descriptions; value columns = every non-id column in ``cols``
    that belongs to the variable group."""

    key_name: str
    value_name: str
    value_cols: tuple[str, ...]
    key_desc: str = ""
    value_desc: str = ""


@dataclass(frozen=True)
class ReadOptions:
    """Per-file read kwargs (transform.json:16-19)."""

    sep: str | None = None  # None → sniff
    header: bool = True
    index_col: str | None = None  # kept as a normal column; recorded as row identity


@dataclass(frozen=True)
class TransformCommand:
    """One ``hot.Parquet`` command (run_annotate.py:187-197)."""

    source: str  # path or token template, e.g. data/mageck/[gene]/rra.txt
    target: str  # output parquet path
    name: str = ""
    desc: str = ""
    cols: tuple[ColumnSpec, ...] = ()
    tokens: tuple[str, ...] = ()  # the reference's ``concat`` token list
    melt: MeltSpec | None = None
    read: ReadOptions = field(default_factory=ReadOptions)
    command: str = "hot.Parquet"


@dataclass(frozen=True)
class Manifest:
    commands: tuple[TransformCommand, ...]

    def to_json(self) -> str:
        def enc(o):
            if isinstance(o, TransformCommand):
                d = {
                    "command": o.command,
                    "params": {
                        "source": o.source,
                        "target": o.target,
                        "name": o.name,
                        "desc": o.desc,
                        "cols": [vars(c) for c in o.cols],
                    },
                }
                if o.tokens:
                    d["params"]["concat"] = list(o.tokens)
                if o.melt:
                    d["params"]["melt"] = {
                        "key": {"name": o.melt.key_name, "desc": o.melt.key_desc},
                        "value": {"name": o.melt.value_name, "desc": o.melt.value_desc},
                        "value_cols": list(o.melt.value_cols),
                    }
                kw = {}
                if o.read.sep is not None:
                    kw["sep"] = o.read.sep
                if o.read.header is not True:
                    # header=False must round-trip: load_manifest defaults
                    # the key to True, so omitting it would re-read the
                    # first data row as a header (code-review r15).
                    kw["header"] = o.read.header
                if o.read.index_col is not None:
                    kw["index_col"] = o.read.index_col
                if kw:
                    d["params"]["kwargs"] = {"read": kw}
                return d
            raise TypeError(type(o))

        return json.dumps(
            {"commands": [enc(c) for c in self.commands]}, indent=2
        )


class ManifestValidationError(ValueError):
    """Malformed manifest — raised at LOAD time with a path to the bad
    field, instead of an opaque failure deep inside Spark (the reference
    ships manifest.schema.json but never validates against it — a drift
    bug we fix rather than replicate, SURVEY.md §5)."""


def _validate_command(d: dict, where: str) -> None:
    if not isinstance(d, dict):
        raise ManifestValidationError(f"{where}: command must be an object, got {type(d).__name__}")
    p = d.get("params", d)
    if not isinstance(p, dict):
        raise ManifestValidationError(f"{where}.params: must be an object")
    for req in ("source", "target"):
        if not isinstance(p.get(req), str) or not p.get(req):
            raise ManifestValidationError(f"{where}.params.{req}: required non-empty string")
    if not isinstance(p.get("cols", []), list):
        raise ManifestValidationError(f"{where}.params.cols: must be a list")
    for i, c in enumerate(p.get("cols", [])):
        if not isinstance(c, dict) or "col" not in c:
            raise ManifestValidationError(f"{where}.params.cols[{i}]: needs a 'col' key")
    if not isinstance(p.get("concat", []), list):
        raise ManifestValidationError(f"{where}.params.concat: must be a list of token names")
    # Sub-shapes reached by _parse_command must be validated HERE — a
    # malformed melt/kwargs otherwise surfaces as a bare AttributeError
    # deep in parsing instead of the documented load-time error with a
    # field path (code-review r15).
    m = p.get("melt")
    if m is not None and not isinstance(m, dict):
        raise ManifestValidationError(f"{where}.params.melt: must be an object")
    if isinstance(m, dict):
        for k in ("key", "value"):
            if k in m and not isinstance(m[k], dict):
                raise ManifestValidationError(
                    f"{where}.params.melt.{k}: must be an object with name/desc"
                )
        if "value_cols" in m and not isinstance(m["value_cols"], list):
            raise ManifestValidationError(
                f"{where}.params.melt.value_cols: must be a list"
            )
    kwv = p.get("kwargs")
    if kwv is not None and not isinstance(kwv, dict):
        raise ManifestValidationError(f"{where}.params.kwargs: must be an object")
    if isinstance(kwv, dict) and "read" in kwv and not isinstance(kwv["read"], dict):
        raise ManifestValidationError(f"{where}.params.kwargs.read: must be an object")
    cmd_name = d.get("command", "hot.Parquet")
    if cmd_name != "hot.Parquet":
        raise ManifestValidationError(
            f"{where}.command: unknown command {cmd_name!r} (only hot.Parquet is declared, run_annotate.py:188)"
        )


def _parse_command(d: dict) -> TransformCommand:
    p = d.get("params", d)
    melt = None
    if "melt" in p and p["melt"]:
        m = p["melt"]
        melt = MeltSpec(
            key_name=m.get("key", {}).get("name", "variable"),
            value_name=m.get("value", {}).get("name", "value"),
            value_cols=tuple(m.get("value_cols", ())),
            key_desc=m.get("key", {}).get("desc", ""),
            value_desc=m.get("value", {}).get("desc", ""),
        )
    kw = p.get("kwargs", {}).get("read", {})
    return TransformCommand(
        source=p["source"],
        target=p["target"],
        name=p.get("name", ""),
        desc=p.get("desc", ""),
        cols=tuple(
            ColumnSpec(c["col"], c.get("name", ""), c.get("desc", ""))
            for c in p.get("cols", [])
        ),
        tokens=tuple(p.get("concat", ())),
        melt=melt,
        read=ReadOptions(
            sep=kw.get("sep"),
            header=kw.get("header", True),
            index_col=kw.get("index_col"),
        ),
        command=d.get("command", "hot.Parquet"),
    )


def load_manifest(obj: str | dict) -> Manifest:
    """Parse a manifest from JSON text or dict; flattens the reference's
    nested command groups (commands is a list of lists at
    run_annotate.py:314-319)."""
    if isinstance(obj, str):
        obj = json.loads(obj)
    if not isinstance(obj, dict) or not isinstance(obj.get("commands", []), list):
        raise ManifestValidationError("manifest root must be {'commands': [...]}")
    raw = obj.get("commands", [])
    flat: list[dict] = []
    for item in raw:
        if isinstance(item, list):
            flat.extend(item)
        else:
            flat.append(item)
    for i, c in enumerate(flat):
        _validate_command(c, f"commands[{i}]")
    return Manifest(commands=tuple(_parse_command(c) for c in flat))
