"""Group-representative re-selection utilities conformance.

Golden expectations from reference
string_grouper_utils/test/test_string_grouper_utils.py:8-330.
"""

import pandas as pd
import pytest
from dateutil.parser import parse

from string_grouper_tpu.utils import (
    new_group_rep_by_completeness,
    new_group_rep_by_earliest_timestamp,
    new_group_rep_by_highest_weight,
)


@pytest.fixture
def customers_df():
    return pd.DataFrame(
        [
            ("BB016741P", "Mega Enterprises Corporation", "Address0", "Tel0", "Description0", 0.2,
             "2014-12-30 10:55:00-02:00", "EE059082Q", "Mega Enterprises Corp."),
            ("CC082744L", "Hyper Startup Incorporated", "", "Tel1", "", 0.5,
             "2017-01-01 20:23:15-05:00", "BB099931J", "Hyper-Startup Inc."),
            ("AA098762D", "Hyper Startup Inc.", "Address2", "Tel2", "Description2", 0.3,
             "2020-10-20 15:29:30+02:00", "BB099931J", "Hyper-Startup Inc."),
            ("BB099931J", "Hyper-Startup Inc.", "Address3", "Tel3", "Description3", 0.1,
             "2013-07-01 03:34:45-05:00", "BB099931J", "Hyper-Startup Inc."),
            ("HH072982K", "Hyper Hyper Inc.", "Address4", "", "Description4", 0.9,
             "2005-09-11 11:56:00-07:00", "HH072982K", "Hyper Hyper Inc."),
            ("EE059082Q", "Mega Enterprises Corp.", "Address5", "Tel5", "Description5", 1.0,
             "1998-04-14 09:21:11+00:00", "EE059082Q", "Mega Enterprises Corp."),
        ],
        columns=("Customer ID", "Customer Name", "Address", "Tel", "Description", "weight",
                 "timestamp", "group ID", "group name"),
    )


EXPECTED_TS = pd.Series(["EE059082Q", "BB099931J", "BB099931J", "BB099931J", "HH072982K", "EE059082Q"])
EXPECTED_T = pd.DataFrame(
    [
        ("EE059082Q", "Mega Enterprises Corp."),
        ("BB099931J", "Hyper-Startup Inc."),
        ("BB099931J", "Hyper-Startup Inc."),
        ("BB099931J", "Hyper-Startup Inc."),
        ("HH072982K", "Hyper Hyper Inc."),
        ("EE059082Q", "Mega Enterprises Corp."),
    ]
)
EXPECTED_TW = pd.DataFrame(
    [
        ("BB016741P", "Mega Enterprises Corporation"),
        ("BB099931J", "Hyper-Startup Inc."),
        ("BB099931J", "Hyper-Startup Inc."),
        ("BB099931J", "Hyper-Startup Inc."),
        ("HH072982K", "Hyper Hyper Inc."),
        ("BB016741P", "Mega Enterprises Corporation"),
    ]
)
EXPECTED_W = pd.DataFrame(
    [
        ("EE059082Q", "Mega Enterprises Corp."),
        ("CC082744L", "Hyper Startup Incorporated"),
        ("CC082744L", "Hyper Startup Incorporated"),
        ("CC082744L", "Hyper Startup Incorporated"),
        ("HH072982K", "Hyper Hyper Inc."),
        ("EE059082Q", "Mega Enterprises Corp."),
    ]
)
EXPECTED_C = pd.DataFrame(
    [
        ("BB016741P", "Mega Enterprises Corporation"),
        ("AA098762D", "Hyper Startup Inc."),
        ("AA098762D", "Hyper Startup Inc."),
        ("AA098762D", "Hyper Startup Inc."),
        ("HH072982K", "Hyper Hyper Inc."),
        ("BB016741P", "Mega Enterprises Corporation"),
    ]
)


def test_timestamp_series_output(customers_df):
    pd.testing.assert_series_equal(
        EXPECTED_TS,
        new_group_rep_by_earliest_timestamp(customers_df, "group ID", "Customer ID", "timestamp"),
    )


def test_timestamp_frame_output(customers_df):
    pd.testing.assert_frame_equal(
        EXPECTED_T,
        new_group_rep_by_earliest_timestamp(
            customers_df, "group ID", "Customer ID", "timestamp", "Customer Name"
        ),
    )


def test_timestamp_series_input(customers_df):
    pd.testing.assert_frame_equal(
        EXPECTED_T,
        new_group_rep_by_earliest_timestamp(
            customers_df, "group ID", "Customer ID", customers_df["timestamp"], "Customer Name"
        ),
    )


def test_timestamp_length_mismatch_raises(customers_df):
    with pytest.raises(Exception):
        new_group_rep_by_earliest_timestamp(
            customers_df, "group ID", "Customer ID", customers_df["timestamp"].iloc[:-2],
            "Customer Name",
        )


def test_timestamp_bad_strings_raise(customers_df):
    with pytest.raises(Exception):
        new_group_rep_by_earliest_timestamp(
            customers_df, "group ID", "Customer ID", customers_df["Customer ID"], "Customer Name"
        )


def test_timestamp_pandas_timestamps(customers_df):
    df2 = customers_df.copy()
    df2["timestamp"] = df2["timestamp"].transform(lambda t: pd.Timestamp(t))
    pd.testing.assert_frame_equal(
        EXPECTED_T,
        new_group_rep_by_earliest_timestamp(
            df2, "group ID", "Customer ID", df2["timestamp"], "Customer Name"
        ),
    )


def test_timestamp_dateutil_datetimes(customers_df):
    df2 = customers_df.copy()
    df2["timestamp"] = df2["timestamp"].transform(lambda t: parse(t))
    pd.testing.assert_frame_equal(
        EXPECTED_T,
        new_group_rep_by_earliest_timestamp(
            df2, "group ID", "Customer ID", df2["timestamp"], "Customer Name"
        ),
    )


def test_timestamp_mixed_types_raise(customers_df):
    df2 = customers_df.copy()
    df2["timestamp"] = df2["timestamp"].astype(object)
    df2.at[0, "timestamp"] = 1.0
    with pytest.raises(Exception):
        new_group_rep_by_earliest_timestamp(
            df2, "group ID", "Customer ID", df2["timestamp"], "Customer Name"
        )


def test_timestamp_numbers(customers_df):
    pd.testing.assert_frame_equal(
        EXPECTED_TW,
        new_group_rep_by_earliest_timestamp(
            customers_df, "group ID", "Customer ID", customers_df["weight"], "Customer Name"
        ),
    )


def test_weight(customers_df):
    pd.testing.assert_frame_equal(
        EXPECTED_W,
        new_group_rep_by_highest_weight(
            customers_df, "group ID", "Customer ID", "weight", "Customer Name"
        ),
    )


def test_weight_series_input(customers_df):
    pd.testing.assert_frame_equal(
        EXPECTED_W,
        new_group_rep_by_highest_weight(
            customers_df, "group ID", "Customer ID", customers_df["weight"], "Customer Name"
        ),
    )


def test_weight_length_mismatch_raises(customers_df):
    with pytest.raises(Exception):
        new_group_rep_by_highest_weight(
            customers_df, "group ID", "Customer ID", customers_df["weight"].iloc[:-2],
            "Customer Name",
        )


def test_completeness_column_list(customers_df):
    pd.testing.assert_frame_equal(
        EXPECTED_C,
        new_group_rep_by_completeness(
            customers_df, "group ID", "Customer ID", "Customer Name", [1, 2, 3, 4]
        ),
    )


def test_completeness_all_columns(customers_df):
    pd.testing.assert_frame_equal(
        EXPECTED_C,
        new_group_rep_by_completeness(customers_df, "group ID", "Customer ID", "Customer Name"),
    )


def test_completeness_dataframe_input(customers_df):
    pd.testing.assert_frame_equal(
        EXPECTED_C,
        new_group_rep_by_completeness(
            customers_df, "group ID", "Customer ID", "Customer Name", customers_df
        ),
    )


def test_completeness_length_mismatch_raises(customers_df):
    with pytest.raises(Exception):
        new_group_rep_by_completeness(
            customers_df, "group ID", "Customer ID", "Customer Name", customers_df.iloc[:-2, :]
        )
