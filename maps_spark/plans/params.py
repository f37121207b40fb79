"""HTTP-request parameter translation — the serving API's front door.

Re-expresses the reference's request parsing so a reference user can
issue the same requests against this engine:

- ``map_keys``     — Params.java:87-131 (one primary map view + optional
  country mask; taxonKey embeds the checklist: ``1:<checklist>|<id>``).
- ``parse_year``   — Params.java:149-171 (``"1990"``, ``"1990,2000"``,
  ``",2000"``, ``"1990,"`` → inclusive, null-unbounded range).
- ``v1_layers_to_filters`` — routes.js:150-270 (legacy layer names like
  ``OBS_1900_1940`` compiled to a basisOfRecord set + year range with
  the reference's validation quirks, faithfully including the
  documented 1900-2020+undated amnesty).

These return plain values the engine operators accept directly
(``serving.density_tile(year_range=..., bors=...)``).
"""

from __future__ import annotations

DEFAULT_CHECKLIST = "d7dddbf4-2cf0-4f39-9b2a-bb099caae36c"  # GBIF backbone

MAP_TYPES = {
    "taxonKey": "1", "datasetKey": "2", "publishingOrg": "3",
    "country": "4", "publishingCountry": "5", "networkKey": "6",
}

ALL_MAP_KEY = "0:0"

# v1 layer prefix -> basisOfRecord members (routes.js:191-223)
_OBS_BORS = ("OBSERVATION", "HUMAN_OBSERVATION", "MACHINE_OBSERVATION")
_SP_BORS = ("PRESERVED_SPECIMEN",)
_OTH_BORS = ("MATERIAL_CITATION", "MATERIAL_SAMPLE", "OCCURRENCE",
             "LITERATURE", "UNKNOWN")
# routes.js:228 clears the filter when "all are selected" (9 BOR codes).
# LITERATURE/UNKNOWN are deprecated aliases outside the encodable set,
# so coverage is judged against the engine's canonical 9 codes.
_CANONICAL_BORS = frozenset((
    "FOSSIL_SPECIMEN", "HUMAN_OBSERVATION", "LIVING_SPECIMEN",
    "MACHINE_OBSERVATION", "MATERIAL_CITATION", "MATERIAL_SAMPLE",
    "OBSERVATION", "OCCURRENCE", "PRESERVED_SPECIMEN"))


def map_keys(params: dict[str, str | list[str]]
             ) -> tuple[str, str | None]:
    """(primary map key, optional country-mask key) from HTTP params.

    Mirrors Params.java:87-131: at most one non-country view; a country
    param alongside another view becomes the mask; a country alone is
    the view itself; nothing -> the all-data key.
    """
    map_key: str | None = None
    mask_key: str | None = None
    checklist = _first(params.get("checklistKey")) or DEFAULT_CHECKLIST

    for name, code in MAP_TYPES.items():
        if name not in params:
            continue
        vals = params[name]
        vals = vals if isinstance(vals, list) else [vals]
        if not vals or vals[0] in (None, ""):
            continue  # ignore empty params (WMTS clients send them)
        if len(vals) > 1:
            raise ValueError("Only one map may be requested. "
                             "Perhaps you need to use ad-hoc mapping?")
        if name == "country":
            mask_key = f"{code}:{vals[0]}"
        elif map_key is not None:
            raise ValueError("Only one type of map may be requested. "
                             "Perhaps you need to use ad-hoc mapping?")
        elif name == "taxonKey":
            map_key = f"{code}:{checklist}|{vals[0]}"
        else:
            map_key = f"{code}:{vals[0]}"

    if map_key is None and mask_key is not None:
        map_key, mask_key = mask_key, None
    return (map_key or ALL_MAP_KEY), mask_key


def checklist_key(map_key: str | None) -> str | None:
    """Checklist from a ``1:<checklist>|<taxon>`` key (Params.java:136-141)."""
    if not map_key or not map_key.startswith("1:"):
        return None
    head, sep, _ = map_key[2:].partition("|")
    return head if sep else None


def parse_year(encoded: str | None) -> tuple[int | None, int | None]:
    """Inclusive (lo, hi); either side None = unbounded
    (Params.java:149-171)."""
    if not encoded:
        return (None, None)
    if "," in encoded:
        parts = encoded.split(",")
        if len(parts) == 2:
            lo = int(parts[0]) if parts[0] else None
            hi = int(parts[1]) if parts[1] else None
            return (lo, hi)
        raise ValueError(
            "Year must contain a single value or a comma separated "
            f"minimum and maximum value.  Supplied: {encoded}")
    y = int(encoded)
    return (y, y)


def v1_layers_to_filters(layers: list[str] | str | None
                         ) -> dict:
    """Compile v1 layer names to engine filters (routes.js:150-270).

    Returns ``{"bors": list|None, "year": (lo, hi)|None,
    "no_year": bool}`` — ``bors=None`` means no BOR filter (all nine
    selected or none requested).
    """
    if layers is None:
        layers = []
    if isinstance(layers, str):
        layers = [layers]

    bors: set[str] = set()
    spans = {"OBS": [9999, -1], "SP": [9999, -1], "OTH": [9999, -1]}
    seen = {"OBS": False, "SP": False, "OTH": False}
    no_year = False

    for layer in layers:
        if layer == "LIVING":
            bors.add("LIVING_SPECIMEN")
            continue
        if layer == "FOSSIL":
            bors.add("FOSSIL_SPECIMEN")
            continue
        prefix, _, rest = layer.partition("_")
        start_s, _, end_s = rest.partition("_")
        if prefix not in spans:
            continue  # routes.js default: ignore unknown prefixes
        bors.update({"OBS": _OBS_BORS, "SP": _SP_BORS,
                     "OTH": _OTH_BORS}[prefix])
        seen[prefix] = True
        if start_s == "NO":
            no_year = True
            continue
        start = 0 if start_s == "PRE" else int(start_s)
        spans[prefix][0] = min(spans[prefix][0], start)
        spans[prefix][1] = max(spans[prefix][1], int(end_s))

    if bors >= _CANONICAL_BORS:
        bors.clear()

    # All year filters must apply to all record types (routes.js:235-259)
    active = [p for p in ("OBS", "SP", "OTH") if seen[p]
              and spans[p][0] != 9999]
    distinct = {tuple(spans[p]) for p in active}
    if len(distinct) > 1:
        detail = "; ".join(
            f"{p} {spans[p][0]}-{spans[p][1]}" for p in ("OBS", "SP", "OTH"))
        raise ValueError("Start and end years must be the same for each "
                         f"layer (BasisOfRecord): {detail}")

    year: tuple[int, int] | None = None
    if any(seen[p] and spans[p][0] == 9999 for p in seen):
        year = None  # that prefix appeared only as NO_YEAR
    elif active:
        year = tuple(distinct.pop())

    if year == (0, 2030) and no_year:
        year = None  # whole range + undated = everything
    elif year is not None and no_year:
        if year == (1900, 2020):
            # documented amnesty: this poor default was in the docs
            year = None
        else:
            raise ValueError("Can't display undated records as well as "
                             "a range of dated ones.")

    return {"bors": sorted(bors) if bors else None, "year": year,
            "no_year": no_year}


#: HTTP search param -> occurrence column (direct equality params)
SEARCH_COLUMNS = {
    "datasetKey": "datasetKey", "publishingOrg": "publishingOrgKey",
    "country": "countryCode", "publishingCountry": "publishingCountry",
    "basisOfRecord": "basisOfRecord",
    "occurrenceStatus": "occurrenceStatus",
}

#: the event index's registry — the event-vectortile-server
#: specialization re-exposes the same resource over a second index
#: with its own searchable fields; the DSL itself is shared.
EVENT_SEARCH_COLUMNS = {
    "eventType": "event_type", "userId": "user_id",
}

TAXON_COLUMNS = ("kingdomKey", "familyKey", "genusKey", "speciesKey")


def search_predicate(params: dict, columns: dict[str, str] | None = None):
    """The ad-hoc predicate DSL (S7): recognized GBIF-style search
    params compiled to one Spark Column (Params.java:178-188 semantics:
    multiple values of a param OR together, params AND together; empty
    values dropped). Unrecognized params are ignored like the
    reference's ``findSearchParam`` miss. Returns None when nothing
    recognized (no filter).

    ``columns`` picks the index's equality-param registry (default: the
    occurrence index; pass :data:`EVENT_SEARCH_COLUMNS` for the event
    index — the event-vectortile-server pattern of one resource class
    bound to a second index). The taxon/network/year special forms
    reference occurrence columns and simply never fire for indexes
    whose requests don't use them.
    """
    import pyspark.sql.functions as F

    if columns is None:
        columns = SEARCH_COLUMNS

    def clean(v) -> list[str]:
        vals = v if isinstance(v, list) else [v]
        return [s.strip() for s in vals
                if s is not None and str(s).strip() != ""]

    preds = []
    for name, raw in params.items():
        vals = clean(raw)
        if not vals:
            continue
        if name in columns:
            col = F.col(columns[name])
            preds.append(col.isin(vals) if len(vals) > 1
                         else col == vals[0])
        elif name == "taxonKey":
            # a taxon matches at any rank of the classification path
            per_val = [
                F.array_contains(F.array(*[F.col(c) for c in TAXON_COLUMNS]),
                                 v) for v in vals]
            p = per_val[0]
            for q in per_val[1:]:
                p = p | q
            preds.append(p)
        elif name == "networkKey":
            per_val = [F.array_contains(F.col("networkKey"), v)
                       for v in vals]
            p = per_val[0]
            for q in per_val[1:]:
                p = p | q
            preds.append(p)
        elif name == "year":
            per_val = []
            for v in vals:
                lo, hi = parse_year(v)
                c = F.lit(True)
                if lo is not None:
                    c = c & (F.col("year") >= lo)
                if hi is not None:
                    c = c & (F.col("year") <= hi)
                per_val.append(c)
            p = per_val[0]
            for q in per_val[1:]:
                p = p | q
            preds.append(p)
        elif name == "hasGeospatialIssue":
            preds.append(F.col("hasGeospatialIssues") ==
                         (vals[0].lower() == "true"))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _first(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, list):
        return v[0] if v else None
    return v
