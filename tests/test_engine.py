"""Engine conformance tests.

Golden expectations are taken from the reference's test fixtures
(reference string_grouper/test/test_string_grouper.py:17-89 and individual
test bodies) -- they are the behavioral spec the TPU build must reproduce.
"""

import numpy as np
import pandas as pd
import pytest

from string_grouper_tpu import (
    StringGrouper,
    StringGrouperConfig,
    StringGrouperNotFitException,
    compute_pairwise_similarities,
    group_similar_strings,
    match_most_similar,
    match_strings,
)
from string_grouper_tpu.config import (
    DEFAULT_IGNORE_CASE,
    DEFAULT_MIN_SIMILARITY,
    DEFAULT_NGRAM_SIZE,
    DEFAULT_REGEX,
)


@pytest.fixture
def simple():
    class SimpleExample:
        customers_df = pd.DataFrame(
            [
                ("BB016741P", "Mega Enterprises Corporation", "Address0", "Tel0", "Description0", 0.2),
                ("CC082744L", "Hyper Startup Incorporated", "", "Tel1", "", 0.5),
                ("AA098762D", "Hyper Startup Inc.", "Address2", "Tel2", "Description2", 0.3),
                ("BB099931J", "Hyper-Startup Inc.", "Address3", "Tel3", "Description3", 0.1),
                ("HH072982K", "Hyper Hyper Inc.", "Address4", "", "Description4", 0.9),
                ("EE059082Q", "Mega Enterprises Corp.", "Address5", "Tel5", "Description5", 1.0),
            ],
            columns=("Customer ID", "Customer Name", "Address", "Tel", "Description", "weight"),
        )
        customers_df2 = pd.DataFrame(
            [
                ("BB016741P", "Mega Enterprises Corporation", "Address0", "Tel0", "Description0", 0.2),
                ("CC082744L", "Hyper Startup Incorporated", "", "Tel1", "", 0.5),
                ("AA098762D", "Hyper Startup Inc.", "Address2", "Tel2", "Description2", 0.3),
                ("BB099931J", "Hyper-Startup Inc.", "Address3", "Tel3", "Description3", 0.1),
                ("DD012339M", "HyperStartup Inc.", "Address4", "Tel4", "Description4", 0.1),
                ("HH072982K", "Hyper Hyper Inc.", "Address5", "", "Description5", 0.9),
                ("EE059082Q", "Mega Enterprises Corp.", "Address6", "Tel6", "Description6", 1.0),
            ],
            columns=("Customer ID", "Customer Name", "Address", "Tel", "Description", "weight"),
        )
        a_few_strings = pd.Series(["BB016741P", "BB082744L", "BB098762D", "BB099931J", "BB072982K", "BB059082Q"])
        one_string = pd.Series(["BB0"])
        whatever_series_1 = pd.Series(["whatever"])
        expected_result_with_zeroes = pd.DataFrame(
            [
                (1, "Hyper Startup Incorporated", 0.08170638, "whatever", 0),
                (0, "Mega Enterprises Corporation", 0.0, "whatever", 0),
                (2, "Hyper Startup Inc.", 0.0, "whatever", 0),
                (3, "Hyper-Startup Inc.", 0.0, "whatever", 0),
                (4, "Hyper Hyper Inc.", 0.0, "whatever", 0),
                (5, "Mega Enterprises Corp.", 0.0, "whatever", 0),
            ],
            columns=["left_index", "left_Customer Name", "similarity", "right_side", "right_index"],
        )
        expected_result_centroid = pd.Series(
            [
                "Mega Enterprises Corporation",
                "Hyper Startup Inc.",
                "Hyper Startup Inc.",
                "Hyper Startup Inc.",
                "Hyper Hyper Inc.",
                "Mega Enterprises Corporation",
            ],
            name="group_rep_Customer Name",
        )
        expected_result_centroid_with_index_col = pd.DataFrame(
            [
                (0, "Mega Enterprises Corporation"),
                (2, "Hyper Startup Inc."),
                (2, "Hyper Startup Inc."),
                (2, "Hyper Startup Inc."),
                (4, "Hyper Hyper Inc."),
                (0, "Mega Enterprises Corporation"),
            ],
            columns=["group_rep_index", "group_rep_Customer Name"],
        )
        expected_result_first = pd.Series(
            [
                "Mega Enterprises Corporation",
                "Hyper Startup Incorporated",
                "Hyper Startup Incorporated",
                "Hyper Startup Incorporated",
                "Hyper Hyper Inc.",
                "Mega Enterprises Corporation",
            ],
            name="group_rep_Customer Name",
        )

    return SimpleExample()


class TestConfig:
    def test_config_defaults(self):
        config = StringGrouperConfig()
        assert config.min_similarity == DEFAULT_MIN_SIMILARITY
        assert config.max_n_matches == 20
        assert config.regex == DEFAULT_REGEX
        assert config.ngram_size == DEFAULT_NGRAM_SIZE
        assert config.ignore_case == DEFAULT_IGNORE_CASE

    def test_config_immutable(self):
        config = StringGrouperConfig()
        with pytest.raises(Exception):
            config.min_similarity = 0.1

    def test_config_non_default_values(self):
        config = StringGrouperConfig(min_similarity=0.1, max_n_matches=100, number_of_processes=1)
        assert config.min_similarity == 0.1
        assert config.max_n_matches == 100
        assert config.number_of_processes == 1

    def test_topn_slack_deprecation_warning(self):
        """Explicit use of the legacy no-op knob warns; defaults don't."""
        import warnings

        s = pd.Series(["foo", "bar"])
        with pytest.warns(DeprecationWarning, match="topn_slack"):
            StringGrouper(s, topn_slack=4)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            StringGrouper(s)  # no warning without the kwarg
        sg = StringGrouper(s)
        with pytest.warns(DeprecationWarning, match="topn_slack"):
            sg.update_options(topn_slack=2)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            sg.update_options(min_similarity=0.5)

    def test_number_of_processes_caps_native_threads(self):
        """The knob is plumbed to the native kernels' OpenMP thread count
        (reference routes it to sp_matmul_topn's n_threads,
        string_grouper.py:22, :731)."""
        from string_grouper_tpu.native import get_scorer_lib

        lib = get_scorer_lib()
        if lib is None:
            pytest.skip("native library unavailable")
        before = int(lib.get_max_threads())
        try:
            s = pd.Series(["foo", "food", "bar"])
            StringGrouper(s, number_of_processes=1).fit()
            assert int(lib.get_max_threads()) == 1
            StringGrouper(s, number_of_processes=2).fit()
            assert int(lib.get_max_threads()) == 2
        finally:
            lib.set_num_threads(before)


class TestNgrams:
    def test_n_grams_case_unchanged(self):
        sg = StringGrouper(pd.Series(["aaa"]), ignore_case=False)
        assert sg.n_grams("McDonalds") == ["McD", "cDo", "Don", "ona", "nal", "ald", "lds"]

    def test_n_grams_ignore_case_to_lower(self):
        sg = StringGrouper(pd.Series(["aaa"]), ignore_case=True)
        assert sg.n_grams("McDonalds") == ["mcd", "cdo", "don", "ona", "nal", "ald", "lds"]

    def test_n_grams_ignore_case_default(self):
        sg = StringGrouper(pd.Series(["aaa"]))
        assert sg.n_grams("McDonalds") == ["mcd", "cdo", "don", "ona", "nal", "ald", "lds"]


class TestMatchesList:
    def test_build_matches_list(self):
        sg = StringGrouper(pd.Series(["foo", "bar", "baz"]), pd.Series(["foo", "bar", "bop"])).fit()
        expected = pd.DataFrame(
            {"master_side": [0, 1], "dupe_side": [0, 1], "similarity": [1.0, 1.0]}
        )
        expected["similarity"] = expected["similarity"].astype(sg._config.tfidf_matrix_dtype)
        pd.testing.assert_frame_equal(expected, sg._matches_list)

    def test_case_insensitive_matches_list(self):
        sg = StringGrouper(pd.Series(["foo", "BAR", "baz"]), pd.Series(["FOO", "bar", "bop"])).fit()
        expected = pd.DataFrame(
            {"master_side": [0, 1], "dupe_side": [0, 1], "similarity": [1.0, 1.0]}
        )
        expected["similarity"] = expected["similarity"].astype(sg._config.tfidf_matrix_dtype)
        pd.testing.assert_frame_equal(expected, sg._matches_list)


class TestGetMatches:
    def test_get_matches_two_dataframes(self):
        sg = StringGrouper(pd.Series(["foo", "bar", "baz"]), pd.Series(["foo", "bar", "bop"])).fit()
        expected = pd.DataFrame(
            {
                "left_index": [0, 1],
                "left_side": ["foo", "bar"],
                "similarity": [1.0, 1.0],
                "right_side": ["foo", "bar"],
                "right_index": [0, 1],
            }
        )
        expected["similarity"] = expected["similarity"].astype(sg._config.tfidf_matrix_dtype)
        pd.testing.assert_frame_equal(expected, sg.get_matches())

    def test_get_matches_single(self):
        sg = StringGrouper(pd.Series(["foo", "bar", "baz", "foo"])).fit()
        expected = pd.DataFrame(
            {
                "left_index": [0, 0, 1, 2, 3, 3],
                "left_side": ["foo", "foo", "bar", "baz", "foo", "foo"],
                "similarity": [1.0] * 6,
                "right_side": ["foo", "foo", "bar", "baz", "foo", "foo"],
                "right_index": [0, 3, 1, 2, 0, 3],
            }
        )
        expected["similarity"] = expected["similarity"].astype(sg._config.tfidf_matrix_dtype)
        pd.testing.assert_frame_equal(expected, sg.get_matches())

    def test_get_matches_1_series_1_id_series(self):
        sg = StringGrouper(
            pd.Series(["foo", "bar", "baz", "foo"]),
            master_id=pd.Series(["A0", "A1", "A2", "A3"]),
        ).fit()
        expected = pd.DataFrame(
            {
                "left_index": [0, 0, 1, 2, 3, 3],
                "left_side": ["foo", "foo", "bar", "baz", "foo", "foo"],
                "left_id": ["A0", "A0", "A1", "A2", "A3", "A3"],
                "similarity": [1.0] * 6,
                "right_id": ["A0", "A3", "A1", "A2", "A0", "A3"],
                "right_side": ["foo", "foo", "bar", "baz", "foo", "foo"],
                "right_index": [0, 3, 1, 2, 0, 3],
            }
        )
        expected["similarity"] = expected["similarity"].astype(sg._config.tfidf_matrix_dtype)
        pd.testing.assert_frame_equal(expected, sg.get_matches())

    def test_get_matches_2_series_2_id_series(self):
        sg = StringGrouper(
            pd.Series(["foo", "bar", "baz"]),
            pd.Series(["foo", "bar", "bop"]),
            master_id=pd.Series(["A0", "A1", "A2"]),
            duplicates_id=pd.Series(["B0", "B1", "B2"]),
        ).fit()
        expected = pd.DataFrame(
            {
                "left_index": [0, 1],
                "left_side": ["foo", "bar"],
                "left_id": ["A0", "A1"],
                "similarity": [1.0, 1.0],
                "right_id": ["B0", "B1"],
                "right_side": ["foo", "bar"],
                "right_index": [0, 1],
            }
        )
        expected["similarity"] = expected["similarity"].astype(sg._config.tfidf_matrix_dtype)
        pd.testing.assert_frame_equal(expected, sg.get_matches())

    def test_match_list_diagonal(self, simple):
        """All self-joins present even with max_n_matches=1
        (reference test:467-476, force_symmetries diagonal fix)."""
        df = simple.customers_df["Customer Name"]
        matches = match_strings(df, max_n_matches=1)
        num_self = len(matches[matches["left_index"] == matches["right_index"]])
        assert num_self == len(df)

    def test_zero_min_similarity(self, simple):
        matches = match_strings(
            simple.customers_df["Customer Name"], simple.whatever_series_1, min_similarity=0
        )
        pd.testing.assert_frame_equal(simple.expected_result_with_zeroes, matches)

    def test_get_non_matches_empty_case(self, simple):
        sg = StringGrouper(
            simple.a_few_strings, simple.one_string, max_n_matches=6, min_similarity=0
        ).fit()
        assert sg._get_non_matches_list().empty


class TestPairwise:
    def test_compute_pairwise_similarities(self, simple):
        df1 = simple.customers_df["Customer Name"]
        df2 = simple.expected_result_centroid
        similarities = compute_pairwise_similarities(df1, df2)
        expected = pd.Series(
            [1.0, 0.6336195351561589, 1.0000000000000004, 1.0000000000000004, 1.0, 0.826462625999832],
            name="similarity",
        ).astype(np.float64)
        pd.testing.assert_series_equal(expected, similarities)
        sg = StringGrouper(df1, df2)
        pd.testing.assert_series_equal(expected, sg.compute_pairwise_similarities(df1, df2))

    def test_pairwise_unequal_lengths_raises(self, simple):
        with pytest.raises(Exception):
            compute_pairwise_similarities(
                simple.customers_df["Customer Name"], simple.expected_result_centroid[:-2]
            )


class TestGroups:
    def test_groups_centroid(self, simple):
        pd.testing.assert_series_equal(
            simple.expected_result_centroid,
            group_similar_strings(
                simple.customers_df["Customer Name"], min_similarity=0.6, ignore_index=True
            ),
        )
        sg = StringGrouper(simple.customers_df["Customer Name"])
        pd.testing.assert_series_equal(
            simple.expected_result_centroid,
            sg.group_similar_strings(
                simple.customers_df["Customer Name"], min_similarity=0.6, ignore_index=True
            ),
        )

    def test_groups_centroid_with_index_col(self, simple):
        pd.testing.assert_frame_equal(
            simple.expected_result_centroid_with_index_col,
            group_similar_strings(
                simple.customers_df["Customer Name"], min_similarity=0.6, ignore_index=False
            ),
        )

    def test_groups_first(self, simple):
        pd.testing.assert_series_equal(
            simple.expected_result_first,
            group_similar_strings(
                simple.customers_df["Customer Name"],
                group_rep="first",
                min_similarity=0.6,
                ignore_index=True,
            ),
        )

    def test_groups_single_valued_series(self):
        pd.testing.assert_frame_equal(
            pd.DataFrame([(0, "hello")], columns=["group_rep_index", "group_rep"]),
            group_similar_strings(pd.Series(["hello"]), min_similarity=0.6),
        )
        pd.testing.assert_series_equal(
            pd.Series(["hello"], name="group_rep"),
            group_similar_strings(pd.Series(["hello"]), min_similarity=0.6, ignore_index=True),
        )
        pd.testing.assert_frame_equal(
            pd.DataFrame([(0, "hello")], columns=["most_similar_index", "most_similar_master"]),
            match_most_similar(pd.Series(["hello"]), pd.Series(["hello"]), min_similarity=0.6),
        )
        pd.testing.assert_series_equal(
            pd.Series(["hello"], name="most_similar_master"),
            match_most_similar(
                pd.Series(["hello"]), pd.Series(["hello"]), min_similarity=0.6, ignore_index=True
            ),
        )

    def test_groups_single_df(self):
        sg = StringGrouper(pd.Series(["foooo", "bar", "baz", "foooob"]), ignore_index=True).fit()
        pd.testing.assert_series_equal(
            pd.Series(["foooo", "bar", "baz", "foooo"], name="group_rep"), sg.get_groups()
        )

    def test_groups_1_string_series_1_id_series(self):
        sg = StringGrouper(
            pd.Series(["foooo", "bar", "baz", "foooob"]),
            master_id=pd.Series(["A0", "A1", "A2", "A3"]),
            ignore_index=True,
        ).fit()
        expected = pd.DataFrame(
            list(zip(["A0", "A1", "A2", "A0"], ["foooo", "bar", "baz", "foooo"])),
            columns=["group_rep_id", "group_rep"],
        )
        pd.testing.assert_frame_equal(expected, sg.get_groups())

    def test_groups_bad_group_rep(self, simple):
        with pytest.raises(Exception):
            group_similar_strings(
                simple.customers_df["Customer Name"], group_rep="nonsense", min_similarity=0.6
            )


class TestMostSimilar:
    def test_two_df(self):
        sg = StringGrouper(
            pd.Series(["foooo", "bar", "baz"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
            ignore_index=True,
        ).fit()
        expected = pd.Series(["foooo", "bar", "baz", "foooo"], name="most_similar_master")
        pd.testing.assert_series_equal(expected, sg.get_groups())
        result = sg.match_most_similar(
            pd.Series(["foooo", "bar", "baz"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
            max_n_matches=3,
        )
        pd.testing.assert_series_equal(expected, result)

    def test_two_df_with_ids(self):
        sg = StringGrouper(
            pd.Series(["foooo", "bar", "baz"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
            master_id=pd.Series(["A0", "A1", "A2"]),
            duplicates_id=pd.Series(["B0", "B1", "B2", "B3"]),
            ignore_index=True,
        ).fit()
        expected = pd.DataFrame(
            list(zip(["A0", "A1", "A2", "A0"], ["foooo", "bar", "baz", "foooo"])),
            columns=["most_similar_master_id", "most_similar_master"],
        )
        pd.testing.assert_frame_equal(expected, sg.get_groups())

    def test_numeric_ids_with_missing_master_value(self):
        sg = StringGrouper(
            pd.Series(["foooo", "bar", "foooo"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
            master_id=pd.Series([0, 1, 2], dtype="Int64"),
            duplicates_id=pd.Series([100, 101, 102, 103], dtype="Int64"),
            ignore_index=True,
        ).fit()
        expected = pd.DataFrame(
            list(zip([0, 1, 102, 0], ["foooo", "bar", "baz", "foooo"])),
            columns=["most_similar_master_id", "most_similar_master"],
        ).astype(dtype={"most_similar_master_id": "Int64", "most_similar_master": "str"})
        pd.testing.assert_frame_equal(expected, sg.get_groups())

    def test_numeric_indexes_replace_na(self):
        master = pd.Series(["foooo", "bar", "foooo"], index=pd.Index([0, 1, 2], dtype="Int64"))
        dupes = pd.Series(
            ["foooo", "bar", "baz", "foooob"], index=pd.Index([100, 101, 102, 103], dtype="Int64")
        )
        sg = StringGrouper(master, dupes, replace_na=True).fit()
        expected = pd.DataFrame(
            list(zip([0, 1, 102, 0], ["foooo", "bar", "baz", "foooo"])),
            columns=["most_similar_index", "most_similar_master"],
            index=dupes.index,
        ).astype(dtype={"most_similar_index": "Int64", "most_similar_master": "str"})
        pd.testing.assert_frame_equal(expected, sg.get_groups())

    def test_same_similarity_tie_goes_to_first(self):
        sg = StringGrouper(
            pd.Series(["foooo", "bar", "baz", "foooo"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
            ignore_index=True,
        ).fit()
        expected = pd.Series(["foooo", "bar", "baz", "foooo"], name="most_similar_master")
        pd.testing.assert_series_equal(expected, sg.get_groups())

    def test_no_match_passthrough(self):
        sg = StringGrouper(
            pd.Series(["foooo", "bar", "baz"]),
            pd.Series(["foooo", "dooz", "bar", "baz", "foooob"]),
            ignore_index=True,
        ).fit()
        expected = pd.Series(
            ["foooo", "dooz", "bar", "baz", "foooo"], name="most_similar_master"
        )
        pd.testing.assert_series_equal(expected, sg.get_groups())

    def test_no_match_passthrough_with_ids(self):
        sg = StringGrouper(
            pd.Series(["foooo", "bar", "baz"]),
            pd.Series(["foooo", "dooz", "bar", "baz", "foooob"]),
            master_id=pd.Series(["A0", "A1", "A2"]),
            duplicates_id=pd.Series(["B0", "B1", "B2", "B3", "B4"]),
            ignore_index=True,
        ).fit()
        expected = pd.DataFrame(
            list(zip(["A0", "B1", "A1", "A2", "A0"], ["foooo", "dooz", "bar", "baz", "foooo"])),
            columns=["most_similar_master_id", "most_similar_master"],
        )
        pd.testing.assert_frame_equal(expected, sg.get_groups())

    def test_unfit_raises(self):
        sg = StringGrouper(pd.Series(["foooo"]), pd.Series(["foooob"]))
        with pytest.raises(StringGrouperNotFitException):
            sg.get_groups()


class TestEdits:
    def test_add_match_raises_if_missing(self):
        sg = StringGrouper(pd.Series(["foooo", "no match", "baz", "foooo"])).fit()
        sg2 = StringGrouper(
            pd.Series(["foooo", "no match", "baz", "foooo"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
        ).fit()
        for grouper in (sg, sg2):
            with pytest.raises(ValueError):
                grouper.add_match("doesnt exist", "baz")
            with pytest.raises(ValueError):
                grouper.add_match("baz", "doesnt exist")

    def test_add_match_single_occurrence(self):
        sg = StringGrouper(pd.Series(["foooo", "no match", "baz", "foooo"])).fit()
        sg.add_match("no match", "baz")
        matches = sg.get_matches()
        assert len(matches[(matches.left_side == "no match") & (matches.right_side == "baz")]) == 1
        sg2 = StringGrouper(
            pd.Series(["foooo", "no match", "baz", "foooo"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
        ).fit()
        sg2.add_match("no match", "bar")
        matches = sg2.get_matches()
        assert len(matches[(matches.left_side == "no match") & (matches.right_side == "bar")]) == 1

    def test_add_match_symmetric_for_self_join(self):
        sg = StringGrouper(pd.Series(["foooo", "no match", "baz", "foooo"])).fit()
        sg.add_match("no match", "baz")
        matches = sg.get_matches()
        assert len(matches[(matches.left_side == "no match") & (matches.right_side == "baz")]) == 1
        assert len(matches[(matches.left_side == "baz") & (matches.right_side == "no match")]) == 1

    def test_add_match_multiple_occurrences(self):
        sg = StringGrouper(
            pd.Series(["foooo", "no match", "baz", "foooo"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
        ).fit()
        sg.add_match("foooo", "baz")
        matches = sg.get_matches()
        assert len(matches[(matches.left_side == "foooo") & (matches.right_side == "baz")]) == 2

    def test_remove_match(self):
        sg = StringGrouper(pd.Series(["foooo", "no match", "baz", "foooob"])).fit()
        sg.remove_match("foooo", "foooob")
        matches = sg.get_matches()
        assert len(matches[(matches.left_side == "foooo") & (matches.right_side == "foooob")]) == 0
        assert len(matches[(matches.left_side == "foooob") & (matches.right_side == "foooo")]) == 0
        sg2 = StringGrouper(
            pd.Series(["foooo", "no match", "baz", "foooob"]),
            pd.Series(["foooo", "bar", "baz", "foooob"]),
        ).fit()
        sg2.remove_match("foooo", "foooob")
        matches = sg2.get_matches()
        assert len(matches[(matches.left_side == "foooo") & (matches.right_side == "foooob")]) == 0

    def test_prior_matches_added(self):
        sample = ["microsoftoffice 365 home", "microsoftoffice 365 pers", "microsoft office"]
        sg = StringGrouper(pd.Series(sample, name="name"), ignore_index=True).fit()
        sg = sg.add_match("microsoft office", "microsoftoffice 365 home")
        sg = sg.add_match("microsoftoffice 365 pers", "microsoft office")
        deduped = sg.get_groups()
        assert len(deduped.unique()) == 1


class TestValidation:
    def test_invalid_id_combinations(self):
        s1 = pd.Series(["foo", "bar", "baz"])
        s2 = pd.Series(["foo", "bar", "bop"])
        bad_id1 = pd.Series(["A0", "A1"])
        good_id1 = pd.Series(["A0", "A1", "A2"])
        good_id2 = pd.Series(["B0", "B1", "B2"])
        with pytest.raises(Exception):
            StringGrouper(s1, master_id=bad_id1)
        with pytest.raises(Exception):
            StringGrouper(s1, duplicates=s2, duplicates_id=pd.Series(["B0", "B1"]), master_id=good_id1)
        with pytest.raises(Exception):
            StringGrouper(s1, s2, master_id=good_id1)
        with pytest.raises(Exception):
            StringGrouper(s1, s2, duplicates_id=good_id2)
        with pytest.raises(Exception):
            StringGrouper(s1, duplicates_id=good_id2)
        with pytest.raises(Exception):
            StringGrouper(s1, master_id=good_id1, duplicates_id=good_id2)
        with pytest.raises(Exception):
            StringGrouper(s1, master_id=good_id1, ignore_index=True, replace_na=True)
        s2_multi = s2.copy()
        s2_multi.index = pd.MultiIndex.from_tuples(list(zip(list("ABC"), [0, 1, 2])))
        with pytest.raises(Exception):
            StringGrouper(s1, duplicates=s2_multi, replace_na=True)

    def test_type_errors(self):
        with pytest.raises(TypeError):
            StringGrouper("foo", "bar")
        with pytest.raises(TypeError):
            StringGrouper(pd.Series(["foo", "bar"]), pd.Series(["foo", 1]))
        with pytest.raises(TypeError):
            StringGrouper(pd.Series(["foo", np.nan]), pd.Series(["foo", "j"]))

    def test_n_blocks_bad_values(self, simple):
        df1 = simple.customers_df2["Customer Name"]
        for bad in [2, (0, 2), (1, 2.5), (1, 2, 3), (1,)]:
            with pytest.raises(Exception):
                match_strings(df1, n_blocks=bad)

    def test_tfidf_dtype_bad_values(self, simple):
        df1 = simple.customers_df2["Customer Name"]
        for bad in [None, 0, "whatever"]:
            with pytest.raises(Exception):
                match_strings(df1, tfidf_matrix_dtype=bad)


class TestBlockingInvariance:
    """Results must be identical for any n_blocks value -- the reference's
    equivalence-under-partitioning suite (test:191-336) recast for the TPU
    streaming scheduler, plus invariance across matcher tile knobs."""

    sort_cols = ["right_index", "left_index"]

    def _fixed(self, df):
        return df.sort_values(self.sort_cols).reset_index(drop=True)

    def test_n_blocks_single_df(self, simple):
        df1 = simple.customers_df2["Customer Name"]
        base = self._fixed(match_strings(df1, min_similarity=0.1))
        for n_blocks in [(1, 2), (1, 5), (2, 1), (2, 2), (3, 2)]:
            got = self._fixed(match_strings(df1, n_blocks=n_blocks, min_similarity=0.1))
            pd.testing.assert_frame_equal(base, got)

    def test_n_blocks_both_df(self, simple):
        df1 = simple.customers_df["Customer Name"]
        df2 = simple.customers_df2["Customer Name"]
        base = self._fixed(match_strings(df1, df2, min_similarity=0.1))
        for n_blocks in [(1, 2), (1, 8), (2, 1), (3, 2)]:
            got = self._fixed(match_strings(df1, df2, n_blocks=n_blocks, min_similarity=0.1))
            pd.testing.assert_frame_equal(base, got)

    def test_tile_knob_invariance(self, simple):
        df1 = simple.customers_df2["Customer Name"]
        base = self._fixed(match_strings(df1, min_similarity=0.1))
        for kwargs in [
            dict(hash_dim=64),
            dict(left_chunk=2),
            dict(topn_slack=1),
            dict(hash_dim=4096, left_chunk=4),
        ]:
            got = self._fixed(match_strings(df1, min_similarity=0.1, **kwargs))
            pd.testing.assert_frame_equal(base, got)


class TestCorpusReuse:
    def test_match_strings_twin_after_reset(self, simple):
        df1 = simple.customers_df2["Customer Name"]
        sg = StringGrouper(df1, min_similarity=0.1)
        pd.testing.assert_series_equal(sg.master, df1)
        assert sg.duplicates is None
        matches = sg.match_strings(df1, n_blocks=(1, 1))
        assert sg._config.n_blocks == (1, 1)
        direct = match_strings(df1, min_similarity=0.1, n_blocks=(1, 1))
        pd.testing.assert_frame_equal(matches, direct)


def test_update_options_invalidates_fit():
    """Changing options un-fits the grouper (reference string_grouper.py:303
    sets is_build=False in _set_options)."""
    import pandas as pd
    import pytest as _pytest

    from string_grouper_tpu import StringGrouper
    from string_grouper_tpu.validation import StringGrouperNotFitException

    sg = StringGrouper(pd.Series(["abc", "abd"]), min_similarity=0.1).fit()
    sg.get_matches()  # fine
    sg.update_options(min_similarity=0.2)
    with _pytest.raises(StringGrouperNotFitException):
        sg.get_matches()
    sg.fit()
    assert len(sg.get_matches()) > 0


def test_reset_data_invalidates_fit():
    import pandas as pd
    import pytest as _pytest

    from string_grouper_tpu import StringGrouper
    from string_grouper_tpu.validation import StringGrouperNotFitException

    sg = StringGrouper(pd.Series(["abc", "abd"]), min_similarity=0.1).fit()
    sg.reset_data(pd.Series(["xyz", "xyw"]))
    with _pytest.raises(StringGrouperNotFitException):
        sg.get_matches()


def test_method_twin_kwargs_reach_the_encoder():
    """Review regression: options set via update_options / method-twin
    kwargs that shape tokenization (ngram_size here) must rebuild the
    encoder -- the reference's vectorizer reads the live config at fit
    time (string_grouper.py:699-707)."""
    s = pd.Series(["hyper startup inc", "hyper startups inc", "mega corp"])
    fresh = StringGrouper(s, ngram_size=2).fit().get_matches()
    via_kwargs = StringGrouper(s).match_strings(s, ngram_size=2)
    pd.testing.assert_frame_equal(fresh, via_kwargs)
    via_update = StringGrouper(s)
    via_update.update_options(ngram_size=2)
    pd.testing.assert_frame_equal(fresh, via_update.fit().get_matches())
    # explicit n_blocks via update_options reaches the bookkeeping attr
    # (fit replaces a None with the reference auto-guess afterwards)
    via_update.update_options(n_blocks=(2, 3))
    assert via_update._n_blocks == (2, 3)


def test_group_representatives_empty():
    from string_grouper_tpu.frame import group_representatives

    out = group_representatives(
        pd.DataFrame({"master_side": [], "dupe_side": [], "similarity": []}),
        0, "first",
    )
    assert len(out) == 0
