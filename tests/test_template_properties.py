"""Property-based tests (hypothesis) for the token-template compiler —
the reference's core path algebra (run_annotate.py:133-136): for ANY
template and token values, glob/regex/extraction must agree.
"""
from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from cirro_annotation_spark.manifest.compiler import (
    extract_tokens,
    java_safe_regex,
    token_template_to_glob,
    token_template_to_regex,
)

# Path literals: filename-safe chars, no glob/regex metachars, no '/'.
_literal = st.text(
    alphabet=st.sampled_from("abcdefghij_0123456789.-"), min_size=1, max_size=8
)
_token_name = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz"), min_size=1, max_size=6
)
# Token values: one path segment, non-empty.
_token_value = st.text(
    alphabet=st.sampled_from("ABCDEFxyz0123456789_-"), min_size=1, max_size=10
)


@st.composite
def template_and_values(draw):
    n = draw(st.integers(min_value=1, max_value=3))
    names = draw(
        st.lists(_token_name, min_size=n, max_size=n, unique=True)
    )
    parts = [draw(_literal)]
    for name in names:
        parts.append(f"[{name}]")
        parts.append(draw(_literal))
    template = "/".join(parts)
    values = {name: draw(_token_value) for name in names}
    return template, values


@given(template_and_values())
@settings(max_examples=200, deadline=None)
def test_template_regex_extracts_planted_values(tv):
    template, values = tv
    tokens = extract_tokens(template)
    assert tokens == list(values)
    path = template
    for name, val in values.items():
        path = path.replace(f"[{name}]", val, 1)
    m = re.fullmatch(token_template_to_regex(template), path)
    assert m, (template, path)
    for name, val in values.items():
        assert m.group(name) == val
    # positional groups (the Java-safe Spark form) agree with named ones
    jm = re.fullmatch(java_safe_regex(token_template_to_regex(template)), path)
    assert jm and [jm.group(i + 1) for i in range(len(tokens))] == [
        values[t] for t in tokens
    ]


@given(template_and_values())
@settings(max_examples=100, deadline=None)
def test_glob_accepts_whatever_regex_accepts(tv):
    """Every path the regex accepts must also match the glob (the glob is
    the coarse pre-filter; it must never drop a regex match)."""
    import fnmatch

    template, values = tv
    path = template
    for name, val in values.items():
        path = path.replace(f"[{name}]", val, 1)
    assert fnmatch.fnmatchcase(path, token_template_to_glob(template))


@given(template_and_values(), _token_value)
@settings(max_examples=100, deadline=None)
def test_token_never_crosses_path_segments(tv, evil):
    """A token must match exactly one path segment: injecting a '/' into
    a token position must NOT fullmatch."""
    template, values = tv
    first = next(iter(values))
    path = template
    for name, val in values.items():
        inject = f"{evil}/{evil}" if name == first else val
        path = path.replace(f"[{name}]", inject, 1)
    assert not re.fullmatch(token_template_to_regex(template), path)
