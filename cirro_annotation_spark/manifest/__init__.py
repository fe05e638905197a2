"""The manifest layer: the reference's declarative transform IR, compiled
to Spark DataFrame pipelines.

Reference contract (run_annotate.py:177-253, 314-326; manifest.schema.json;
json/example/transform.json): a manifest is a list of commands, each
``{"command": "hot.Parquet", "params": {source, target, name, desc, cols,
concat?, melt?, kwargs?}}``. This package parses/validates that shape
(model), compiles each command to a lazy DataFrame chain (compiler),
generates manifests from raw directory trees non-interactively (planner),
and executes them to Parquet (executor).
"""

from cirro_annotation_spark.manifest.compiler import compile_command, token_template_to_regex
from cirro_annotation_spark.manifest.executor import execute_manifest
from cirro_annotation_spark.manifest.model import (
    ColumnSpec,
    Manifest,
    MeltSpec,
    TransformCommand,
)
from cirro_annotation_spark.manifest.planner import build_manifest

__all__ = [
    "ColumnSpec",
    "Manifest",
    "MeltSpec",
    "TransformCommand",
    "build_manifest",
    "compile_command",
    "execute_manifest",
    "token_template_to_regex",
]
