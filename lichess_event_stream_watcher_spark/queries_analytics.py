"""Analytics query family: state/window/agg/join analogs (SURVEY.md §2.4-2.6)
plus TPC-H-style headline queries on the driver tables. Populated in stages;
see queries.py for the registry contract."""

from __future__ import annotations
