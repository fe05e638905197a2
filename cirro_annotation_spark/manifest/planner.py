"""Non-interactive manifest builder — the reference's annotate flow
(run_annotate.py:257-326) with the prompts replaced by declarative specs.

The reference walks a dataset, asks the user which files are "variable"
(token-templated families, :124-174) and which columns form a melt group
(:104-120), resolves columns against a fields dictionary (:283-309), and
emits the manifest. Here the same decisions arrive as arguments; the
planner does the walking, sniffing, harvesting, and grouping.
"""

from __future__ import annotations

import os
import re
from collections.abc import Mapping, Sequence

from pyspark.sql import SparkSession

from cirro_annotation_spark.manifest.compiler import (
    extract_tokens,
    token_template_to_regex,
)
from cirro_annotation_spark.manifest.fields import (
    FieldsDictionary,
    load_fields_dictionary,
)
from cirro_annotation_spark.manifest.model import (
    ColumnSpec,
    Manifest,
    MeltSpec,
    ReadOptions,
    TransformCommand,
)
from cirro_annotation_spark.sources.discovery import discover_files
from cirro_annotation_spark.sources.dsv import harvest_columns


def group_variable_files(
    files: Sequence[str], templates: Sequence[str]
) -> tuple[dict[str, list[str]], list[str]]:
    """Partition files into template-matched families vs standard files
    (run_annotate.py:124-174: pattern→regex→match loop). Returns
    ({template: matched_files}, remaining_standard_files)."""
    remaining = list(files)
    groups: dict[str, list[str]] = {}
    for template in templates:
        # gz is a transparent suffix (run_annotate.py:259 ext list).
        regex = re.compile(token_template_to_regex(template) + r"(?:\.gz)?$")
        matched = [f for f in remaining if regex.match(f)]
        groups[template] = sorted(matched)
        remaining = [f for f in remaining if f not in set(matched)]
    return groups, remaining


def _resolve_cols(
    columns: Sequence[str],
    dictionary: FieldsDictionary,
    process: str = "*",
    file: str = "*",
) -> tuple[ColumnSpec, ...]:
    """Dictionary resolution (run_annotate.py:283-309): known columns get
    {name, desc} via alias + process/file scope matching (the rich
    fields.json:3-75 semantics); unknown columns pass through with empty
    metadata (the reference prompts interactively; we keep them — dropping
    data silently is worse than missing descriptions)."""
    out = []
    for c in columns:
        meta = dictionary.resolve(c, process=process, file=file) or {}
        out.append(ColumnSpec(col=c, name=meta.get("name") or c, desc=meta.get("desc", "")))
    return tuple(out)


def build_manifest(
    spark: SparkSession,
    data_directory: str,
    variable_templates: Sequence[str] = (),
    melt_groups: Mapping[str, Sequence[str]] | None = None,
    dictionary=None,
    melt_key_name: str = "sample",
    melt_value_name: str = "reads",
    process: str = "*",
    index_cols: Mapping[str, str] | None = None,
) -> Manifest:
    """Walk ``data_directory``, classify files, harvest columns, emit the
    manifest.

    - variable_templates: ``[token]`` path templates relative to the root.
    - melt_groups: {file_or_template: [value columns to fold]}.
    - dictionary: any fields.json shape (rich alias/scoped, flat, mapping).
    - process: pipeline process id for scoped dictionary resolution.
    - index_cols: {file_or_template: row-identity column}
      (transform.json:16-19 ``kwargs.read.index_col``).
    """
    melt_groups = dict(melt_groups or {})
    dictionary = load_fields_dictionary(dictionary or {})
    index_cols = dict(index_cols or {})
    files = discover_files(data_directory)
    var_groups, standard = group_variable_files(files, variable_templates)

    commands: list[TransformCommand] = []

    # Variable families (generate_variable_file_manifest, :177-215).
    for template, members in var_groups.items():
        if not members:
            continue
        cols = harvest_columns(spark, data_directory, members[:1])[members[0]]
        tokens = extract_tokens(template)
        melt = _melt_for(template, cols, melt_groups, melt_key_name, melt_value_name)
        target = _target_name(template)
        commands.append(
            TransformCommand(
                source=f"$data_directory/{template}",
                target=target,
                name=target,
                desc=f"variable family {template}",
                cols=_resolve_cols(cols, dictionary, process=process, file=template),
                tokens=tuple(tokens),
                melt=melt,
                read=ReadOptions(index_col=index_cols.get(template)),
            )
        )

    # Standard files (generate_standard_file_manifest, :218-253).
    # Basename targets collide when two directories carry a same-named
    # file; the executor's overwrite would then silently destroy the
    # first output (code-review r15). Colliding files switch to their
    # full relative path (separators -> __), unique by construction.
    by_target: dict[str, list[str]] = {}
    for rel in standard:
        by_target.setdefault(_target_name(rel), []).append(rel)
    target_for = {
        rel: (tgt if len(rels) == 1
              else _target_name(rel.replace("/", "__").replace(os.sep, "__")))
        for tgt, rels in by_target.items()
        for rel in rels
    }
    for rel in standard:
        cols = harvest_columns(spark, data_directory, [rel])[rel]
        melt = _melt_for(rel, cols, melt_groups, melt_key_name, melt_value_name)
        target = target_for[rel]
        commands.append(
            TransformCommand(
                source=f"$data_directory/{rel}",
                target=target,
                name=target,
                desc=f"standard file {rel}",
                cols=_resolve_cols(cols, dictionary, process=process, file=rel),
                melt=melt,
                read=ReadOptions(index_col=index_cols.get(rel)),
            )
        )
    return Manifest(commands=tuple(commands))


def _melt_for(
    key: str,
    cols: Sequence[str],
    melt_groups: Mapping[str, Sequence[str]],
    key_name: str,
    value_name: str,
) -> MeltSpec | None:
    if key not in melt_groups:
        return None
    value_cols = tuple(c for c in melt_groups[key] if c in set(cols))
    if not value_cols:
        return None
    return MeltSpec(key_name=key_name, value_name=value_name, value_cols=value_cols)


def _target_name(rel: str) -> str:
    """Output name from the path basename (run_annotate.py:191, 230)."""
    base = os.path.basename(rel)
    for ext in (".gz", ".txt", ".csv", ".tsv"):
        if base.endswith(ext):
            base = base[: -len(ext)]
    return base.replace(".", "_") + ".parquet"
