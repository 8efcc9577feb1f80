"""High-level function wiring, mirroring the reference's mock pattern
(reference test_string_grouper.py:396-449): each one-shot function must
build a StringGrouper, fit it, and extract the right output with the right
forwarded options."""

from unittest.mock import MagicMock, patch

import pandas as pd

import string_grouper_tpu.api as api


@patch("string_grouper_tpu.api.StringGrouper")
def test_match_strings_wiring(mock_sg):
    inst = MagicMock()
    mock_sg.return_value = inst
    inst.fit.return_value = inst
    series = pd.Series(["a", "b"])
    out = api.match_strings(series, min_similarity=0.5)
    mock_sg.assert_called_once_with(
        series, duplicates=None, master_id=None, duplicates_id=None,
        min_similarity=0.5,
    )
    inst.fit.assert_called_once()
    inst.get_matches.assert_called_once()
    assert out is inst.get_matches.return_value


@patch("string_grouper_tpu.api.StringGrouper")
def test_match_most_similar_forces_top1(mock_sg):
    """max_n_matches is forced to 1 (reference string_grouper.py:120)."""
    inst = MagicMock()
    mock_sg.return_value = inst
    inst.fit.return_value = inst
    master = pd.Series(["a"])
    dupes = pd.Series(["b"])
    out = api.match_most_similar(master, dupes, min_similarity=0.3)
    _, kwargs = mock_sg.call_args
    assert kwargs["max_n_matches"] == 1
    assert kwargs["min_similarity"] == 0.3
    inst.get_groups.assert_called_once()
    assert out is inst.get_groups.return_value


@patch("string_grouper_tpu.api.StringGrouper")
def test_group_similar_strings_wiring(mock_sg):
    inst = MagicMock()
    mock_sg.return_value = inst
    inst.fit.return_value = inst
    s = pd.Series(["a"])
    ids = pd.Series([1])
    out = api.group_similar_strings(s, string_ids=ids)
    mock_sg.assert_called_once_with(s, master_id=ids)
    inst.get_groups.assert_called_once()
    assert out is inst.get_groups.return_value


@patch("string_grouper_tpu.api.StringGrouper")
def test_compute_pairwise_similarities_wiring(mock_sg):
    inst = MagicMock()
    mock_sg.return_value = inst
    s1 = pd.Series(["a"])
    s2 = pd.Series(["b"])
    out = api.compute_pairwise_similarities(s1, s2, ngram_size=2)
    mock_sg.assert_called_once_with(s1, s2, ngram_size=2)
    inst.dot.assert_called_once()
    assert out is inst.dot.return_value
