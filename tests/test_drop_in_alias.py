"""The ``string_grouper`` alias package makes migration zero-change: the
reference's import paths work against the TPU-native build."""

import pandas as pd


def test_reference_import_path():
    from string_grouper import (
        StringGrouper,
        StringGrouperConfig,
        match_strings,
    )

    out = match_strings(pd.Series(["abc def", "abc deg"]), min_similarity=0.1)
    assert list(out.columns) == [
        "left_index", "left_side", "similarity", "right_side", "right_index"
    ]
    assert StringGrouperConfig().min_similarity == 0.8
    assert StringGrouper is not None


def test_reference_inner_module_path():
    from string_grouper.string_grouper import (
        DEFAULT_MIN_SIMILARITY,
        DEFAULT_REGEX,
        StringGrouper,
    )

    assert DEFAULT_MIN_SIMILARITY == 0.8
    assert DEFAULT_REGEX == r"[,-./]|\s"
    assert StringGrouper is not None
