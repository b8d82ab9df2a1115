"""Entity clustering / disambiguation: the reference's author/affiliation
block-and-cluster machinery over a generic mention table.

Semantics reimplemented (NOT copied) from /root/reference/apps/api/services/
disambiguation/blocking.py:

- block key = normalized surname + first initial (:171-263 build_author_blocks)
  → here: first-token + first-char-of-second-token of the normalized mention
- ``greedy_cluster`` (:116-140): transitive single-link placement — a mention
  joins the first cluster containing any member with JW ≥ threshold (0.75)
- tiers (:236-255): Tier 1 auto-apply when min pairwise JW ≥ 0.95; Tier 2
  review otherwise; singleton clusters skipped
- split proposals (:266-359): same-spelling mentions partitioned by connected
  components over shared-feature edges; ≥ 2 components ⇒ split proposal

Ray shape: explode mentions (map_batches) → groupby(block hash) → per-block
greedy clustering in map_groups (blocks are small by construction — the
reference's cancellation-every-256-rows concern disappears because blocks
parallelize as groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from bibexpy_ray.functions import hashing
from bibexpy_ray.functions.normalize import normalize_name
from bibexpy_ray.functions.similarity import jaro_winkler
from bibexpy_ray.pipelines.tables import read_table

CLUSTER_THRESHOLD = 0.75   # blocking.py greedy threshold
TIER1_MIN_JW = 0.95        # blocking.py Tier-1 auto bar
MAX_BLOCK = 128            # hot-block split bound (greedy pass is O(block²))


def greedy_cluster(mentions: list[str], threshold: float = CLUSTER_THRESHOLD) -> list[list[int]]:
    """Transitive single-link clustering of mention indices (blocking.py:116-140):
    each mention joins the FIRST existing cluster where any member clears the
    JW threshold; order of iteration is the given order (callers sort for
    determinism)."""
    clusters: list[list[int]] = []
    for i, m in enumerate(mentions):
        placed = False
        for c in clusters:
            if any(jaro_winkler(m, mentions[j]) >= threshold for j in c):
                c.append(i)
                placed = True
                break
        if not placed:
            clusters.append([i])
    return clusters


def min_pairwise_jw(mentions: list[str]) -> float:
    """Cluster-coherence measure (blocking.py:143-152 _min_pairwise_jw)."""
    if len(mentions) < 2:
        return 1.0
    lo = 1.0
    for i in range(len(mentions)):
        for j in range(i + 1, len(mentions)):
            lo = min(lo, jaro_winkler(mentions[i], mentions[j]))
    return lo


def block_key(norm: str) -> str:
    """(first token, first char of second token) — the surname+initial analog."""
    toks = norm.split()
    if not toks:
        return ""
    second = toks[1][0] if len(toks) > 1 and toks[1] else ""
    return f"{toks[0]}_{second}"


def cluster_block(block: pd.DataFrame) -> pd.DataFrame:
    """Per-block map_groups: greedy-cluster the block's mention variants.

    Input columns: mention_id, mention, _norm. Output: one row per proposed
    cluster of ≥ 2 distinct variants — canonical (most frequent variant,
    ties by lexicographic order), members, tier.
    """
    empty = pd.DataFrame(
        {
            "canonical": pd.Series([], dtype=object),
            "variants": pd.Series([], dtype=object),
            "n_mentions": pd.Series([], dtype=np.int64),
            "tier": pd.Series([], dtype=np.int64),
            "min_jw": pd.Series([], dtype=np.float64),
        }
    )
    counts = block.groupby("_norm")["mention_id"].count().sort_index()
    variants = sorted(counts.index.tolist())  # deterministic iteration order
    if len(variants) < 2:
        return empty
    rows = []
    for c in greedy_cluster(variants):
        if len(c) < 2:
            continue
        vs = [variants[i] for i in c]
        lo = min_pairwise_jw(vs)
        tier = 1 if lo >= TIER1_MIN_JW else 2
        canonical = max(vs, key=lambda v: (counts[v], v))
        rows.append(
            {
                "canonical": canonical,
                "variants": "|".join(vs),
                "n_mentions": int(sum(counts[v] for v in vs)),
                "tier": tier,
                "min_jw": round(lo, 4),
            }
        )
    if not rows:
        return empty
    return pd.DataFrame(rows)


def cluster_mentions(ds: rd.Dataset, mention_col: str, n_parts: int = 32) -> rd.Dataset:
    """Generic mention-clustering pipeline: normalize → block → per-block greedy.

    ``ds`` needs an id column ``mention_id`` and the mention column.

    Two shuffles, not one: the greedy pass is O(block²) scalar Jaro-Winkler,
    so parallelism must be per LEAF block, not per coarse block key. A
    single shuffle on ``_bkey`` serializes the whole stage when one key is
    hot (e.g. every mention sharing its first token — one partition does
    all the quadratic work single-core; measured 11 s for 15k single-prefix
    names at 32 CPUs). Stage 1 partitions by ``_bkey`` and does only the
    CHEAP work — the hierarchical prefix refinement that determines leaf
    block membership (string slicing, linear). Stage 2 re-partitions by the
    refined LEAF key and runs the quadratic greedy with every leaf in
    parallel. Leaf membership — and therefore the output — is identical to
    the fused form because refinement depends only on the rows sharing a
    ``_bkey``, which stage 1 co-locates.
    """

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        norm = [normalize_name(m) for m in batch[mention_col].fillna("")]
        keys = [block_key(n) for n in norm]
        out = pd.DataFrame(
            {
                "mention_id": batch["mention_id"].to_numpy(),
                "mention": batch[mention_col].to_numpy(),
                "_norm": norm,
                "_bkey": keys,
            }
        )
        out = out[(out["_norm"] != "") & (out["_bkey"] != "")]
        h = hashing.text_hash_u64(out["_bkey"].tolist())
        out["_part"] = (h % np.uint64(n_parts)).astype(np.int32)
        return out

    def leaf_depth(g: pd.DataFrame, depth: int = 0):
        """Hierarchical block refinement (hot-block split): a block larger
        than MAX_BLOCK is re-split by a lengthening prefix of the normalized
        mention, recursively — bounded blocks are what keeps the greedy
        stage linear under skewed name distributions. Returns a per-row
        Series of the depth at which each row's leaf block settles."""
        if len(g) <= MAX_BLOCK or depth > 24:
            return pd.Series(depth, index=g.index, dtype=np.int64)
        parts = [
            leaf_depth(sub, depth + 1)
            for _, sub in g.groupby(g["_norm"].str.slice(0, 10 + depth))
        ]
        return pd.concat(parts)

    def assign_leaves(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.copy()
            out["_leaf"] = pd.Series([], dtype=object)
            out["_part"] = pd.Series([], dtype=np.int32)
            return out
        df = df.reset_index(drop=True)  # reduce frames can carry dup indexes
        depths = []
        for _, g in df.groupby("_bkey"):
            depths.append(leaf_depth(g))
        d = pd.concat(depths).reindex(df.index)
        # leaf id = (coarse key, settle depth, FORMING prefix). A leaf that
        # settled at depth dd was formed by grouping on slice(0, 10+dd-1) at
        # its parent's depth — its rows share exactly that prefix, NOT the
        # one-longer slice at dd (using the longer slice would splinter each
        # leaf into per-next-char fragments and change the clustering). The
        # depth stays part of the identity: leaves of different depths can
        # share a prefix string.
        prefix = pd.Series(
            [n[: 9 + dd] if dd else "" for n, dd in zip(df["_norm"], d)],
            index=df.index,
        )
        out = df.copy()
        out["_leaf"] = df["_bkey"] + "\x1f" + d.astype(str) + "\x1f" + prefix
        h = hashing.text_hash_u64(out["_leaf"].tolist())
        out["_part"] = (h % np.uint64(n_parts)).astype(np.int32)
        return out

    def per_leaf_part(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("_leaf"):
            o = cluster_block(g)
            if len(o):
                outs.append(o)
        if not outs:
            return cluster_block(df.iloc[:0])
        return pd.concat(outs, ignore_index=True)

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    leaves = hash_partition_apply(
        ds.map_batches(explode, batch_format="pandas"), n_parts, assign_leaves
    )
    return hash_partition_apply(leaves, n_parts, per_leaf_part)


def customer_name_clusters(sf_dir: str) -> pd.DataFrame:
    """Entity-clustering query over customer names (disambiguation analog)."""
    ds = read_table(sf_dir, "customer", ["c_custkey", "c_name"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"mention_id": batch["c_custkey"], "c_name": batch["c_name"]}
        )

    out = cluster_mentions(ds.map_batches(prep, batch_format="pandas"), "c_name").to_pandas()
    return out.sort_values(["canonical", "variants"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Split proposals (blocking.py:266-359 build_author_splits analog)
# ---------------------------------------------------------------------------


def split_proposals(
    ds: rd.Dataset, mention_col: str, feature_col: str, n_parts: int = 32
) -> pd.DataFrame:
    """Same-spelling mentions partitioned into connected components over
    shared-feature edges; ≥ 2 disjoint components ⇒ split proposal
    (blocking.py:266-359): the largest component keeps the plain name, the
    others get (b)(c)… suffixes — exactly the reference's renaming scheme.

    Feature model: two mentions of the same spelling connect iff they share a
    feature value; components = disjoint feature-value groups (the reference's
    `_field_components` over WC/SC/DE/ID token sets).
    """

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        norm = [normalize_name(m) for m in batch[mention_col].fillna("")]
        out = pd.DataFrame(
            {
                "_norm": norm,
                "feature": batch[feature_col].fillna("").astype(str),
            }
        )
        out = out[out["_norm"] != ""]
        h = hashing.text_hash_u64(out["_norm"].tolist())
        out["_part"] = (h % np.uint64(n_parts)).astype(np.int32)
        return out

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for name, g in df.groupby("_norm"):
            counts = g.groupby("feature").size().sort_index()
            feats = [f for f in counts.index if f]
            if len(feats) < 2:
                continue
            # components: distinct feature values are disjoint evidence sets
            # (the generic analog of disjoint token-set components)
            comps = sorted(feats, key=lambda f: (-counts[f], f))
            suffixes = [""] + [f"({chr(ord('b') + i)})" for i in range(len(comps) - 1)]
            for comp, suf in zip(comps, suffixes):
                rows.append(
                    {
                        "mention": name,
                        "component_feature": comp,
                        "n_mentions": int(counts[comp]),
                        "proposed_name": name + (f" {suf}" if suf else ""),
                    }
                )
        if not rows:
            return pd.DataFrame(
                {
                    "mention": pd.Series([], dtype=object),
                    "component_feature": pd.Series([], dtype=object),
                    "n_mentions": pd.Series([], dtype=np.int64),
                    "proposed_name": pd.Series([], dtype=object),
                }
            )
        return pd.DataFrame(rows)

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
        .sort_values(["mention", "component_feature"])
        .reset_index(drop=True)
    )


def source_lang_splits(sf_dir: str) -> pd.DataFrame:
    """Split-proposal query: sources serving ≥ 2 languages get per-language
    split components (the same-spelling/different-field-evidence case)."""
    ds = read_table(sf_dir, "documents", ["source", "lang"])
    return split_proposals(ds, "source", "lang")


# ---------------------------------------------------------------------------
# Token-set field components (blocking.py:266-359 build_author_splits,
# the full transitive semantics — split_proposals above is the simpler
# one-value-per-record variant kept for its oracle)
# ---------------------------------------------------------------------------

import re as _re

_SPLIT_SUFFIX_RE = _re.compile(r"\s*\((?:[b-z]|\d+)\)\s*$", _re.IGNORECASE)


def has_split_suffix(name: str) -> bool:
    """True for already-split names ('LIU L (b)') — they must never become
    split candidates again or every scan would re-split them ('(b) (b)');
    blocking.py:40-46 semantics."""
    return bool(_SPLIT_SUFFIX_RE.search(str(name or "")))


def field_components(field_sets: list[frozenset]) -> list[int]:
    """Component label per record under the 'shares any field token' relation,
    transitively closed (blocking.py:266-284 ``_field_components`` semantics).

    The reference scans components per record (O(n·comps) set intersections);
    here a token-inverted union-find does it in O(Σ|fields|): the first record
    seen for each token anchors it, later records union into the anchor.
    Labels are the component's smallest record index.
    """
    n = len(field_sets)
    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    anchor: dict = {}
    for i, fs in enumerate(field_sets):
        for t in fs:
            j = anchor.setdefault(t, i)
            if j != i:
                ra, rb = find(i), find(j)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra  # smaller index wins ⇒ label = min index
    return [find(i) for i in range(n)]


_SUFFIXES = ["", "(b)", "(c)", "(d)", "(e)", "(f)", "(g)"]


def _suffix(gi: int) -> str:
    """Component gi (0-based, largest first) → name suffix; beyond (g) the
    reference falls back to the numeric index (blocking.py:319,341)."""
    return _SUFFIXES[gi] if gi < len(_SUFFIXES) else f"({gi})"


def _mention_components(df: pd.DataFrame):
    """Yield (mention, components-largest-first, tier) for every mention that
    qualifies for a split proposal (see build_field_splits for the rules)."""
    for mention, g in df.groupby("mention"):
        if not mention or has_split_suffix(mention):
            continue
        recs = list(zip(g["rec_id"].tolist(), g["fields"].tolist()))
        if len(recs) < 2:
            continue
        withf = [
            (rid, frozenset(fs)) for rid, fs in recs if fs is not None and len(fs)
        ]
        n_unknown = len(recs) - len(withf)
        if len(withf) < 2:
            continue
        labels = field_components([fs for _, fs in withf])
        comps: dict[int, list[tuple[int, frozenset]]] = {}
        for (rid, fs), lab in zip(withf, labels):
            comps.setdefault(lab, []).append((rid, fs))
        if len(comps) < 2:
            continue
        ordered = sorted(
            comps.values(), key=lambda c: (-len(c), min(r for r, _ in c))
        )
        yield mention, ordered, (2 if n_unknown else 1)


def build_split_assignments(df: pd.DataFrame) -> pd.DataFrame:
    """Per-RECORD rename assignments from the split proposals: one row
    (rec_id, mention, proposed_name) for every record in a non-first
    component — the input ``apply_splits`` rewrites with. First-component
    records keep the plain name and are not emitted."""
    rows = []
    for mention, ordered, _tier in _mention_components(df):
        for gi, comp in enumerate(ordered[1:], start=1):
            name = f"{mention} {_suffix(gi)}"
            rows.extend(
                {"rec_id": rid, "mention": mention, "proposed_name": name}
                for rid, _ in comp
            )
    if not rows:
        return pd.DataFrame(
            {
                "rec_id": pd.Series([], dtype=np.int64),
                "mention": pd.Series([], dtype=object),
                "proposed_name": pd.Series([], dtype=object),
            }
        )
    return pd.DataFrame(rows).astype({"rec_id": np.int64})


def build_field_splits(df: pd.DataFrame) -> pd.DataFrame:
    """Split proposals from token-set field evidence, one input row per
    (mention, record): columns mention, rec_id, fields (list of tokens;
    empty/None = record without field info).

    Reference semantics (blocking.py:286-359): already-suffixed mentions are
    skipped; a mention needs ≥ 2 records WITH fields; components via
    transitive shared-token merge; < 2 components ⇒ no proposal; the largest
    component keeps the plain name, the rest get (b)(c)… by descending size
    (ties broken by smallest record id — the deterministic stand-in for the
    reference's insertion order); any record WITHOUT field info demotes the
    proposal to Tier 2 (ask), else Tier 1 (auto).
    """
    cols = {
        "mention": pd.Series([], dtype=object),
        "proposed_name": pd.Series([], dtype=object),
        "n_records": pd.Series([], dtype=np.int64),
        "rec_min": pd.Series([], dtype=np.int64),
        "tier": pd.Series([], dtype=np.int64),
        "fields": pd.Series([], dtype=object),
    }
    rows = []
    for mention, ordered, tier in _mention_components(df):
        for gi, comp in enumerate(ordered):
            suf = _suffix(gi)
            gfields = sorted({t for _, fs in comp for t in fs})[:8]
            rows.append(
                {
                    "mention": mention,
                    "proposed_name": mention + (f" {suf}" if suf else ""),
                    "n_records": len(comp),
                    "rec_min": min(r for r, _ in comp),
                    "tier": tier,
                    "fields": "|".join(str(t) for t in gfields),
                }
            )
    if not rows:
        return pd.DataFrame(cols)
    out = pd.DataFrame(rows)
    return out.astype({c: s.dtype for c, s in cols.items()})


def field_component_splits(
    ds: rd.Dataset, n_parts: int = 32
) -> rd.Dataset:
    """Distributed wrapper: ``ds`` has columns (mention, rec_id, fields:
    list<str>); mentions hash-partition so each group lands whole."""

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["mention"].fillna("") != ""].copy()
        h = hashing.text_hash_u64(out["mention"].astype(str).tolist())
        out["_part"] = (h % np.uint64(n_parts)).astype(np.int32)
        return out

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    return hash_partition_apply(
        ds.map_batches(add_part, batch_format="pandas"), n_parts, build_field_splits
    )


def interval_splits(sf_dir: str) -> pd.DataFrame:
    """Split-proposal query with TRANSITIVE field evidence: per source, each
    document carries the interval tokens {n_chars//50, n_chars//50+1}, so
    records chain through adjacent length buckets and a source whose document
    lengths have a gap > one bucket splits into ≥ 2 components — exercising
    the chained-merge semantics the per-value variant (entity_splits) cannot.
    SQL-expressible ⇒ oracle-checked via a recursive reachability CTE."""
    ds = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        b = (batch["n_chars"] // 50).astype("Int64")
        keep = batch["source"].fillna("") != ""
        keep &= b.notna()
        bb = b[keep].astype(np.int64)
        return pd.DataFrame(
            {
                "mention": batch["source"][keep],
                "rec_id": batch["doc_id"][keep].astype(np.int64),
                "fields": [[str(x), str(x + 1)] for x in bb.tolist()],
            }
        )

    out = field_component_splits(
        ds.map_batches(prep, batch_format="pandas")
    ).to_pandas()
    if len(out) == 0:
        # a corpus dense enough to leave no length-bucket gaps proposes no
        # splits; to_pandas() on the all-empty Dataset drops the schema
        # (0-column frame), so rebuild the output shape explicitly
        return pd.DataFrame(
            {
                "mention": pd.Series([], dtype=object),
                "proposed_name": pd.Series([], dtype=object),
                "n_records": pd.Series([], dtype=np.int64),
                "rec_min": pd.Series([], dtype=np.int64),
                "tier": pd.Series([], dtype=np.int64),
            }
        )
    return (
        out.drop(columns=["fields"])
        .sort_values(["mention", "proposed_name"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Authority-set (ORCID) arbitration — orcid.py:245-261 analog
# ---------------------------------------------------------------------------


def classify_by_authority_sets(id_sets: list[set[str]]) -> str:
    """Group decision from per-member authority-id sets (the reference's
    ``classify_by_orcid``, /root/reference/apps/api/services/disambiguation/
    orcid.py:245-261 — semantics reimplemented):

      'merge'    — every pair of KNOWN sets intersects → same entity
      'conflict' — any two known sets are disjoint → different entities
      'unknown'  — fewer than two members carry ids → fall through to the
                   name/field heuristics (Tier-2 review)
    """
    known = [s for s in id_sets if s]
    if len(known) < 2:
        return "unknown"
    for i in range(len(known)):
        for j in range(i + 1, len(known)):
            if not (known[i] & known[j]):
                return "conflict"
    return "merge"


def arbitrate_clusters(
    clusters: pd.DataFrame,
    mention_ids: dict[str, set[str]],
) -> pd.DataFrame:
    """Apply authority-set arbitration to a cluster table: each cluster row
    gains an ``authority_decision`` column ('merge' promotes Tier 2 → Tier 1;
    'conflict' demotes ANY tier to Tier 3/skip — the authoritative id
    overrides similarity, like the DOI-determinative rule).

    ``clusters``: rows with (cluster_id, members) where members is a
    '; '-joined mention list; ``mention_ids``: mention → set of authority ids
    (absent/empty = unknown).
    """
    out = clusters.copy()
    decisions: list[str] = []
    tiers: list[int] = []
    for t in out.itertuples(index=False):
        members = [m for m in str(t.members).split("; ") if m]
        decision = classify_by_authority_sets(
            [mention_ids.get(m, set()) for m in members]
        )
        decisions.append(decision)
        tier = int(getattr(t, "tier", 2))
        if decision == "merge":
            tier = 1
        elif decision == "conflict":
            tier = 3
        tiers.append(tier)
    out["authority_decision"] = decisions
    out["tier"] = tiers
    return out
