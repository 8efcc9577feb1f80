"""Quickstart: the four high-level APIs end to end.

Run: python examples/quickstart.py
"""

import pathlib
import sys

# Allow running straight from a source checkout (pip-installed usage does
# not need this).
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import pandas as pd

from string_grouper_tpu import (
    StringGrouper,
    compute_pairwise_similarities,
    group_similar_strings,
    match_most_similar,
    match_strings,
)
from string_grouper_utils import new_group_rep_by_highest_weight

customers = pd.DataFrame(
    {
        "customer_id": ["A01", "A02", "A03", "A04", "A05", "A06", "A07"],
        "name": [
            "Mega Enterprises Corporation",
            "Hyper Startup Incorporated",
            "Hyper Startup Inc.",
            "Hyper-Startup Inc.",
            "HyperStartup Inc.",
            "Hyper Hyper Inc.",
            "Mega Enterprises Corp.",
        ],
        "weight": [3, 1, 9, 2, 4, 5, 7],
    }
)

print("== all similar pairs (self-join) ==")
print(match_strings(customers.name, master_id=customers.customer_id))

print("\n== dedup: group representatives (centroid) ==")
grouped = group_similar_strings(
    customers.name, string_ids=customers.customer_id, min_similarity=0.6
)
print(grouped)

print("\n== re-pick representatives by business weight ==")
customers["group_id"] = grouped["group_rep_customer_id"]
print(
    new_group_rep_by_highest_weight(
        customers, "group_id", "customer_id", weights="weight",
        record_name_col="name",
    )
)

print("\n== best master per new record ==")
new_names = pd.Series(["Hyper Startup Inc", "Mega Ent. Corp.", "Something Else"])
print(match_most_similar(customers.name, new_names, min_similarity=0.4))

print("\n== row-wise similarities ==")
print(
    compute_pairwise_similarities(
        customers.name, customers.name.str.upper()
    )
)

print("\n== stateful engine with interactive edits ==")
sg = StringGrouper(customers.name, min_similarity=0.6).fit()
sg.add_match("Hyper Hyper Inc.", "Mega Enterprises Corporation")
print(sg.get_groups())
print("per-phase timings:", sg.timings)
