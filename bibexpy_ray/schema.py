"""Arrow schemas for the engine's tables.

The primary input schema is mandated by BASELINE.json ``input_hint``:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string, caption:string,
phash:int64)``. Derived signature columns are appended by map_batches stages and
dropped before final output (the reference's ``_norm_*`` side-column pattern,
/root/reference/apps/api/services/smart_merger.py:610-621, 741-750).
"""

from __future__ import annotations

import pyarrow as pa

#: Primary image+caption input table (BASELINE.json input_hint).
IMAGE_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.large_binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)

#: Signature columns appended by the signer stage.
SIGNATURE_FIELDS = [
    pa.field("_norm_caption", pa.large_string()),
    pa.field("_caption_hash", pa.uint64()),
    pa.field("_n_shingles", pa.int32()),
    pa.field("_simhash", pa.uint64()),
    pa.field("_minhash", pa.list_(pa.uint64())),
    pa.field("_authority", pa.string()),  # determinative id parsed from image_id ('#'-suffix)
]

#: Candidate-edge table (ids only — image bytes never enter a shuffle).
EDGE_SCHEMA = pa.schema(
    [
        pa.field("id_a", pa.string()),
        pa.field("id_b", pa.string()),
        pa.field("src", pa.string()),  # which candidate generator emitted it
    ]
)

#: Verified-match audit schema (reference match_audit analog, smart_merger.py:465-476).
MATCH_AUDIT_SCHEMA = pa.schema(
    [
        pa.field("id_a", pa.string()),
        pa.field("id_b", pa.string()),
        pa.field("stage", pa.string()),
        pa.field("confidence", pa.float64()),
        pa.field("similarity", pa.float64()),
        pa.field("phash_hamming", pa.int32()),
        pa.field("reason", pa.string()),
    ]
)

#: Conformance-fixture record schema (FIXTURES.md §2 — the reference's _rec shape).
CONFORMANCE_SCHEMA = pa.schema(
    [
        pa.field("rec_id", pa.string()),
        pa.field("side", pa.string()),  # 'wos' | 'scopus'
        pa.field("norm_key_a", pa.string()),
        pa.field("norm_key_b", pa.string()),
        pa.field("norm_key_c", pa.string()),
        pa.field("norm_text", pa.string()),
        pa.field("norm_year", pa.int32()),
        pa.field("norm_group", pa.string()),
        pa.field("norm_secondary", pa.string()),
        pa.field("vl", pa.string()),
        pa.field("bp", pa.string()),
        pa.field("pg", pa.string()),
    ]
)


def authority_of(image_id: str) -> str | None:
    """Parse the optional determinative authority id from an image_id.

    Convention: ``img_000000000042#srcA17`` carries authority id ``srcA17``.
    The authority id is the DOI analog: equal ids match at Stage 1; *differing*
    ids are a hard negative (never matched, never borderline) — mirroring the
    reference's DOI-determinative rule (smart_merger.py:205-240).
    """
    if "#" in image_id:
        return image_id.split("#", 1)[1] or None
    return None
