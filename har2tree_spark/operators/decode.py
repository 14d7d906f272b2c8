"""Multi-way payload decode dispatch — the F9/F10/F14 family.

The reference's largest scalar-function family is the POST-body / embedded-
resource decode dispatch (reference nodes.py:260-498 + helper.py:85-127):
a ~15-way branch on payload shape (json / base64 / data-URI / raw ...)
with a "blind retry" arm that re-attempts base64 after fixing padding.

Re-grounded as ONE whole-stage-codegen'd CASE cascade over a payload string
column — every arm is a pure ``F.*`` expression (regexp gate -> decode), no
UDF, no Python. Arms, in dispatch priority:

  empty          -> ''            (kind 'empty')
  data-URI b64   -> unbase64 of the payload part   (F14 + F10)
  data-URI raw   -> payload part as-is
  base64         -> unbase64                        (F9)
  base64 padfix  -> unbase64 after re-padding       (F10 blind-retry arm;
                    length % 4 == 1 is unfixable -> decode_ok = false)
  hex            -> unhex
  json           -> payload as-is, tagged json      (F9 json arm)
  plain          -> payload as-is

Every decode is regexp-gated so the JVM decoder only ever sees
valid-by-construction input (ANSI mode never throws); ``decode_ok`` records
the blind-retry failure case. The decoded bytes are returned as a string
without UTF-8 validation (same contract as the reference's lenient reads).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

B64_RE = "^[A-Za-z0-9+/]+={0,2}$"
B64_NOPAD_RE = "^[A-Za-z0-9+/]+$"
HEX_RE = "^[0-9a-fA-F]+$"


def _unb64(c: Column) -> Column:
    return F.unbase64(c).cast("string")


def decode_dispatch(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Adds (decode_kind, decode_ok, decoded) for ``payload_col``."""
    p = F.col(payload_col)
    is_data = p.startswith("data:")
    duri_hdr = F.split_part(p, F.lit(","), F.lit(1))
    duri_body = F.split_part(p, F.lit(","), F.lit(2))
    b64ish = p.rlike(B64_RE)
    # the blind-retry (re-pad) arm only fires on inputs with NO existing
    # padding: repadding a partially padded string like 'QQQQQ=' would
    # build invalid base64 ('QQQQQ===') and break the never-throws
    # invariant — such inputs fall through to the plain arm instead
    b64_nopad = p.rlike(B64_NOPAD_RE)
    padded_ok = F.length(p) % 4 == 0
    pad_fixable = F.length(p) % 4 != 1
    repadded = F.concat(p, F.repeat(F.lit("="), (4 - F.length(p) % 4) % 4))
    hexish = p.rlike(HEX_RE) & (F.length(p) % 2 == 0)
    jsonish = p.startswith("{") | p.startswith("[")

    # hex is dispatched BEFORE base64: the hex grammar is a strict subset of
    # the base64 charset, so the more specific arm must win (otherwise every
    # hex payload of length % 4 == 0 would base64-decode into garbage bytes)
    kind = (
        F.when(p == "", "empty")
        .when(is_data & duri_hdr.contains(";base64"), "data_uri_b64")
        .when(is_data, "data_uri_raw")
        .when(hexish, "hex")
        .when(b64ish & padded_ok, "base64")
        .when(b64_nopad, "base64_padfix")
        .when(jsonish, "json")
        .otherwise("plain")
    )
    decoded = (
        F.when(p == "", "")
        .when(
            is_data & duri_hdr.contains(";base64"),
            F.when(duri_body.rlike(B64_RE) & (F.length(duri_body) % 4 == 0),
                   _unb64(duri_body)).otherwise(""),
        )
        .when(is_data, duri_body)
        .when(hexish, F.unhex(p).cast("string"))
        .when(b64ish & padded_ok, _unb64(p))
        .when(b64_nopad & pad_fixable, _unb64(repadded))
        .when(b64_nopad, "")  # length % 4 == 1: no padding can fix it
        .otherwise(p)
    )
    ok = (
        F.when(
            is_data & duri_hdr.contains(";base64"),
            duri_body.rlike(B64_RE) & (F.length(duri_body) % 4 == 0),
        )
        .when(~is_data & ~hexish & b64_nopad & ~padded_ok, pad_fixable)
        .otherwise(F.lit(True))
    )
    return df.withColumn("decode_kind", kind).withColumn("decode_ok", ok).withColumn(
        "decoded", decoded
    )
