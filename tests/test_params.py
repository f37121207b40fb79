"""Request-translation parity (Params.java:87-171, routes.js:150-270)."""

import pytest

from maps_spark.plans import params as P


class TestMapKeys:
    def test_default_all(self):
        assert P.map_keys({}) == ("0:0", None)

    def test_taxon_embeds_checklist(self):
        key, mask = P.map_keys({"taxonKey": "212",
                                "checklistKey": "c-uuid"})
        assert key == "1:c-uuid|212"
        assert mask is None

    def test_taxon_default_checklist(self):
        key, _ = P.map_keys({"taxonKey": "212"})
        assert key == f"1:{P.DEFAULT_CHECKLIST}|212"

    def test_country_alone_is_view(self):
        assert P.map_keys({"country": "DK"}) == ("4:DK", None)

    def test_country_plus_view_is_mask(self):
        key, mask = P.map_keys({"datasetKey": "abc", "country": "DK"})
        assert (key, mask) == ("2:abc", "4:DK")

    def test_two_views_rejected(self):
        with pytest.raises(ValueError):
            P.map_keys({"datasetKey": "a", "publishingOrg": "b"})

    def test_repeated_view_rejected(self):
        with pytest.raises(ValueError):
            P.map_keys({"datasetKey": ["a", "b"]})

    def test_empty_param_ignored(self):
        assert P.map_keys({"datasetKey": ""}) == ("0:0", None)

    def test_checklist_key_roundtrip(self):
        assert P.checklist_key("1:abc|42") == "abc"
        assert P.checklist_key("2:abc") is None
        assert P.checklist_key("1:noPipe") is None


class TestParseYear:
    @pytest.mark.parametrize("enc,expect", [
        (None, (None, None)), ("", (None, None)),
        ("1990", (1990, 1990)),
        ("1990,2000", (1990, 2000)),
        (",2000", (None, 2000)),
        ("1990,", (1990, None)),
    ])
    def test_forms(self, enc, expect):
        assert P.parse_year(enc) == expect

    def test_three_parts_rejected(self):
        with pytest.raises(ValueError):
            P.parse_year("1,2,3")


class TestV1Layers:
    def test_obs_range(self):
        f = P.v1_layers_to_filters(["OBS_1900_1940"])
        assert f["year"] == (1900, 1940)
        assert set(f["bors"]) == set(P._OBS_BORS)

    def test_merged_contiguous_ranges(self):
        f = P.v1_layers_to_filters(["OBS_1900_1940", "OBS_1940_1960"])
        assert f["year"] == (1900, 1960)

    def test_pre_1900(self):
        f = P.v1_layers_to_filters(["SP_PRE_1900"])
        assert f["year"] == (0, 1900)

    def test_living_fossil(self):
        f = P.v1_layers_to_filters(["LIVING", "FOSSIL"])
        assert set(f["bors"]) == {"LIVING_SPECIMEN", "FOSSIL_SPECIMEN"}
        assert f["year"] is None

    def test_mismatched_ranges_rejected(self):
        with pytest.raises(ValueError):
            P.v1_layers_to_filters(["OBS_1900_1940", "SP_1950_1960"])

    def test_no_year_only(self):
        f = P.v1_layers_to_filters(["OBS_NO_YEAR"])
        assert f["year"] is None
        assert f["no_year"] is True

    def test_amnesty_1900_2020(self):
        f = P.v1_layers_to_filters(["OBS_1900_2020", "OBS_NO_YEAR"])
        assert f["year"] is None

    def test_range_plus_undated_rejected(self):
        with pytest.raises(ValueError):
            P.v1_layers_to_filters(["OBS_1900_1940", "OBS_NO_YEAR"])

    def test_full_range_plus_undated_ok(self):
        f = P.v1_layers_to_filters(["OBS_PRE_1900", "OBS_1900_2030",
                                    "OBS_NO_YEAR"])
        assert f["year"] is None

    def test_all_nine_bors_clears_filter(self):
        f = P.v1_layers_to_filters(
            ["OBS_1900_1940", "SP_1900_1940", "OTH_1900_1940",
             "LIVING", "FOSSIL"])
        assert f["bors"] is None
        assert f["year"] == (1900, 1940)

    def test_single_string_accepted(self):
        f = P.v1_layers_to_filters("OBS_1990_2000")
        assert f["year"] == (1990, 2000)


class TestEventAdhocSearch:
    """The event-vectortile-server specialization: the shared ad-hoc
    DSL bound to the event index (second-table wiring demo)."""

    def test_predicate_filters_and_facets(self, spark):
        import os

        from maps_spark.operators.adhoc import adhoc_event_search
        sf = os.environ.get("SPARK_GRAFT_SF_SMALL",
                            "/root/testdata/sf0.001")
        events = spark.read.parquet(f"{sf}/events.parquet")
        out = adhoc_event_search(
            events, params={"eventType": ["click", "view"],
                            "year": "2024"}).collect()
        assert out
        assert {r.event_type for r in out} <= {"click", "view"}
        # facet totals reconcile with a direct filtered count
        n_direct = events.where(
            "event_type IN ('click','view') AND "
            "extract(year from ts) = 2024").count()
        assert sum(r.n for r in out) == n_direct
        # ordered by count desc (facet-limit semantics)
        ns = [r.n for r in out]
        assert ns == sorted(ns, reverse=True)

    def test_user_param_and_empty_params(self, spark):
        import os

        from maps_spark.operators.adhoc import adhoc_event_search
        sf = os.environ.get("SPARK_GRAFT_SF_SMALL",
                            "/root/testdata/sf0.001")
        events = spark.read.parquet(f"{sf}/events.parquet")
        one_user = adhoc_event_search(events, params={"userId": "3"})
        direct = events.where("user_id = 3").count()
        assert sum(r.n for r in one_user.collect()) == direct
        # no params -> no filter, all events faceted
        allrows = adhoc_event_search(events)
        assert sum(r.n for r in allrows.collect()) == events.count()
