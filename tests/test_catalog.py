"""Catalog-matching mode tests — the H2 integration fixture re-expressed
set-oriented (T/repository/DatabaseIntegrationTest.java:41-106, FIXTURES.md §3):
identifier lookups must surface BOTH the main entity and its location
sub-entity; orphaned locations raise I14."""

import datetime

import pyspark.sql.functions as F
import pytest

from entity_matching_spark.operators.catalog import (
    CATALOG_DDL,
    catalog_to_records,
    find_by_id,
    match_records_to_catalog,
)


def _catalog_df(spark):
    rows = [
        # (entity_id, full_name, short_name, ultimate_parent, mei, lei, ein,
        #  debt_domain_id, email_domain, country_code, legal_address,
        #  tax_address, record_type, parent_customer_id, last_modified)
        (1, "Test Corp", "TestCo", None, "MEI123", "LEI456", "EIN789",
         None, "testcorp.com", "US", None, None, "MAIN", None,
         datetime.datetime(2026, 1, 1)),
        # location sub-entity sharing the identifiers (H2 fixture rows :67-76)
        (2, "Location LLC", "LocCo", None, "MEI123", "LEI456", "EIN789",
         None, None, "US", None, None, "LOCATION", 1,
         datetime.datetime(2026, 1, 1)),
        # orphaned location: LOCATION without parent_customer_id (I14)
        (3, "Orphan Location Ltd", "OrphCo", None, "MEI999", None, None,
         None, None, "GB", None, None, "LOCATION", None,
         datetime.datetime(2026, 1, 1)),
        (4, "Unrelated Industries", "UnrelCo", None, None, None, None,
         None, None, "DE", None, None, "MAIN", None,
         datetime.datetime(2026, 1, 1)),
    ]
    return spark.createDataFrame(rows, CATALOG_DDL)


def _probe_df(spark, mei="MEI123", name="Test Corp"):
    from entity_matching_spark.operators.score import SIDE_COLS

    cols = list(SIDE_COLS)
    row = {c: None for c in cols}
    row.update({
        "conv_id": "conv00000001",
        "mei": mei,
        "ein_nohyphen": None,
        "legal_name": name,
        "norm_legal_name": name.lower().replace(" corp", ""),
        "clean_name_key": "".join(ch for ch in name.lower() if ch.isalnum()),
        "country_code": "US",
        "entity_type": "UNKNOWN",
    })
    row.setdefault("has_tax", False)
    ddl = ", ".join(f"{c} boolean" if c == "has_tax" else f"{c} string" for c in cols)
    return spark.createDataFrame([tuple(row[c] for c in cols)], ddl)


class TestCatalogMatching:
    def test_identifier_lookup_returns_main_and_location(self, spark):
        """B1 location-UNION semantics: an MEI probe surfaces 2 candidates
        (main + location), like findByMEI returning 2 rows (H2 test :87-105)."""
        scored = match_records_to_catalog(_probe_df(spark), _catalog_df(spark))
        got = {r["entity_id"]: r for r in scored.collect()}
        assert {1, 2} <= set(got)
        assert got[1]["identifier_score"] >= 40.0  # mei base 40 + boosts
        assert got[2]["identifier_score"] >= 40.0

    def test_orphaned_location_discrepancy(self, spark):
        scored = match_records_to_catalog(
            _probe_df(spark, mei="MEI999", name="Orphan Location Ltd"),
            _catalog_df(spark),
        )
        row = scored.where("entity_id = 3").collect()
        assert row, "expected the orphan location as a candidate"
        types = [d["type"] for d in row[0]["discrepancies"]]
        assert "ORPHANED_LOCATION_RECORD" in types

    def test_catalog_records_projection(self, spark):
        rec = catalog_to_records(_catalog_df(spark))
        r = {x["entity_id"]: x for x in rec.collect()}
        assert r[1]["legal_name"] == "Test Corp"
        assert r[1]["clean_name_key"] == "testco"  # short_name, not full name
        assert r[1]["conv_id"].startswith("zcat:")
        assert r[2]["record_type"] == "LOCATION"

    def test_find_by_id(self, spark):
        got = find_by_id(_catalog_df(spark), 1).collect()
        assert len(got) == 1 and got[0]["full_name"] == "Test Corp"


class TestCatalogRound2:
    def test_short_name_type_signal(self, spark):
        """G1 analyzeShortName (EntityTypeDetector.java:155-165): FM/FUND/MGMT
        markers in short_name -> MANAGED_FUND at 0.7; neutral rows stay
        UNKNOWN (catalog types must not be constant)."""
        import datetime

        rows = [
            (10, "Quiet Timber Works", "ACMEFM", None, None, None, None, None,
             None, "US", None, None, "MAIN", None, datetime.datetime(2026, 1, 1)),
            (11, "Quiet Timber Works", "ZX_MGMT_1", None, None, None, None, None,
             None, "US", None, None, "MAIN", None, datetime.datetime(2026, 1, 1)),
            (12, "Quiet Timber Works", "PLAINCO", None, None, None, None, None,
             None, "US", None, None, "MAIN", None, datetime.datetime(2026, 1, 1)),
        ]
        rec = catalog_to_records(spark.createDataFrame(rows, CATALOG_DDL))
        got = {r["entity_id"]: r["entity_type"] for r in rec.collect()}
        assert got[10] == "MANAGED_FUND"  # short name ends FM -> 0.7 signal
        assert got[11] == "MANAGED_FUND"  # MGMT substring
        assert got[12] == "UNKNOWN"

    def test_orientation_independent_of_id_sort(self, spark):
        """ADVICE fix: a probe whose conv_id sorts AFTER the catalog prefix
        ('zz...' > 'zcat:') must still land in the probe role (conv_id_a),
        with entity_id parsed from the catalog side."""
        probe = _probe_df(spark).withColumn(
            "conv_id", F.lit("zz_probe_after_zcat")
        )
        scored = match_records_to_catalog(probe, _catalog_df(spark))
        rows = scored.collect()
        assert rows, "expected candidates"
        for r in rows:
            assert r["probe_conv_id"] == "zz_probe_after_zcat"
            assert r["entity_id"] in (1, 2, 3, 4)

    def test_catalog_internal_duplicates_penalized(self, spark):
        """ADVICE fix: catalog rows 1 and 2 share MEI/LEI/EIN (J1 duplicate
        within the catalog) — the -5 dup penalty must fire for them even
        though catalog-catalog pairs are never scored."""
        scored = match_records_to_catalog(_probe_df(spark), _catalog_df(spark))
        got = {r["entity_id"]: r for r in scored.collect()}
        assert got[1]["dup_penalty"] == 5.0
        assert got[2]["dup_penalty"] == 5.0
