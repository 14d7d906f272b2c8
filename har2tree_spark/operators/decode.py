"""Multi-way payload decode dispatch — the F9/F10/F14 family.

The reference's largest scalar-function family is the POST-body / embedded-
resource decode dispatch (reference nodes.py:260-498 + helper.py:85-127):
a ~15-way branch on payload mimetype/shape (urlencoded / json / json-stream /
multipart / base64 / data-URI / garbled gzip / raw ...) with a "blind retry"
arm that re-attempts base64 after fixing padding, and a ``posted_data_size``
computed POST-decode (nodes.py:486-498).

Re-grounded as ONE whole-stage-codegen'd CASE cascade over a payload string
column — every arm is a pure ``F.*`` expression (regexp gate -> decode), no
UDF, no Python. The reference dispatches on a declared mimetype; a
shape-dispatched engine must order ambiguous grammars specific-first (hex is
a subset of the base64 charset; a trailing '=' is both base64 padding and an
empty form value). Arms, in dispatch priority:

  empty          -> ''                     (kind 'empty')
  gzip garbled   -> payload as-is, ok=false (nodes.py:270-276: the
                    '\\x1f\\ufffd\\x08' replacement-character signature of a
                    gzip blob garbled by UTF-8 decoding; kept, flagged)
  ion            -> blackbox tag + keep-raw, ok=false. Two gates: the Ion
                    text version marker '$ion_' prefix, or a data-URI whose
                    declared mimetype starts with application/x-amzn-ion —
                    the in-band analogue of the reference's mimetype
                    dispatch (nodes.py:361-375). The second-tier
                    ``decode_structural`` pass upgrades this arm via an
                    import-gated amazon.ion decode (absent in this
                    container -> stays blackbox)
  dns_wire       -> blackbox tag (data-URI declared application/dns-message,
                    nodes.py:428-433); transport ;base64 layer decoded,
                    wire payload kept raw, ok=false. ``decode_structural``
                    upgrades it with a pure-stdlib RFC 1035 wire parse
  protobuf       -> blackbox tag (data-URI declared grpc-web+proto /
                    x-protobuf / proto / x-protobuffer, nodes.py:400-413);
                    transport layer decoded, bytes kept raw, ok=false.
                    ``decode_structural`` upgrades it with a schema-less
                    varint/wire-type field walk (the blackboxprotobuf idea)
  data-URI b64   -> unbase64 of the payload part       (F14 + F10)
  data-URI raw   -> payload part as-is
  multipart      -> part bodies joined by newline      (nodes.py:377-398;
                    '--<boundary>' framing, blank-line header separator.
                    r6: normalization now matches the reference's
                    direction (nodes.py:386-390) — a payload without any
                    \\r\\n is rewritten \\n -> \\r\\n before part
                    extraction, so multiline part CONTENT carries \\r\\n
                    exactly as the reference's part.text does; the join
                    separator between parts stays \\n, this engine's
                    canonical list serialization)
  hex            -> unhex (before base64: strict-subset grammar)
  base64         -> unbase64                           (F9)
  base64 padfix  -> unbase64 after re-padding a pad-free payload (F10
                    blind-retry; an unfixable length % 4 == 1 payload falls
                    through to the raw arms — the reference's binascii.Error
                    -> keep-raw fallback, nodes.py:290-294. The reference
                    blindly appends b'===' and lets the decoder discard the
                    excess, nodes.py:122-124; computing the exact pad is
                    outcome-identical for every fixable length)
  base64 trailpad-> a pad-free base64 body with EXACTLY one trailing '='
                    and length %% 4 == 1 ('QUJD='): the reference's blind
                    b'===' append lands on a complete unpadded group plus a
                    tolerated all-pad group, so it decodes the stripped
                    body (nodes.py:122-124; binascii accepts 'QUJD====' but
                    rejects 'QQ====' — only the stripped-length %% 4 == 0
                    class is repairable, which the %% 4 == 1 gate encodes).
                    Must dispatch before the form arm, which also matches
                    a single trailing '=' (the r4 ADVICE 'QQ=' recall case)
  base64 urlsafe -> '-_' alphabet translated to '+/' then unbase64
                    (nodes.py:126-128 altchars branch), incl. the same
                    pad-fix retry; must dispatch before the form arm ('=': a
                    urlsafe payload with trailing padding also parses as a
                    k=v pair, and the reference's blind b64 attempt runs
                    before any mimetype dispatch)
  form-urlencoded-> full percent-decode (F.try_url_decode: %XX unescape
                    + '+' -> space — the reference's parse_qs value
                    semantics, nodes.py:307-323; DEFAULT since r6, with
                    ``full_percent_decode=False`` keeping the legacy
                    '+'-only normalization; the DuckDB oracle mirrors the
                    gate corpus's closed escape set with a replace
                    chain). NOTE: a single trailing-'='
                    base64 fragment like 'QQ=' parses as a form pair with an
                    empty value under shape dispatch; with a declared
                    mimetype the reference would base64-retry it instead —
                    documented trade-off of mimetype-less dispatch.)
  json stream    -> concatenated JSON objects reframed as one JSON array
                    (nodes.py:344-360 application/x-json-stream; exact for
                    flat payloads whose strings don't contain '}{')
  json           -> payload as-is, tagged json         (F9 json arm)
  xml            -> markup payload kept as-is, tagged  (nodes.py:414-427
                    application/atom+xml: kept raw when no JSON embeds)
  plain          -> payload as-is

Every decode is regexp-gated so the JVM decoder only ever sees
valid-by-construction input (ANSI mode never throws); ``decode_ok`` records
the garbled-gzip and invalid-data-URI failure cases. ``decoded_size``
implements the reference's POST-decode size rules (nodes.py:486-498):
0 for empty/undecodable, else the length of the decoded value — the
list/dict branches (len(json.dumps(obj))) map to the length of this
engine's canonical string serialization of those arms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# anchors are \z (absolute end of input), NOT $: Java's $ also matches
# before a trailing newline, so 'QUJD\n' would pass a $-anchored base64
# gate and feed an invalid character into the ANSI decoder (found by the
# never-throws fuzz test). RE2 — the oracle dialect — gives $ the \z
# semantics already, so the SQL mirrors keep their $ anchors.
B64_RE = "^[A-Za-z0-9+/]+={0,2}\\z"
B64_NOPAD_RE = "^[A-Za-z0-9+/]+\\z"
B64_URL_RE = "^[A-Za-z0-9_-]+={0,2}\\z"
HEX_RE = "^[0-9a-fA-F]+\\z"
GZIP_GARBLED_PREFIX = "\x1f�\x08"
MULTIPART_RE = "^--[A-Za-z0-9]+\r?\n"  # either framing dispatches
MULTIPART_PART_RE = "(?s)\r\n\r\n(.*?)\r\n--"  # applied AFTER \n->\r\n normalization
FORM_RE = "^[A-Za-z0-9_.~%+-]+=[A-Za-z0-9_.~%+&=-]*\\z"
JSON_STREAM_RE = "\\}\\{"
ION_MARKER = "$ion_"  # Ion text version marker ($ion_1_0 ...)
# data-URI declared mimetypes routed to the blackbox keep-raw arms
# (reference nodes.py:361-375 ion, 400-413 protobuf, 428-433 dns-message)
PROTOBUF_MIMES = (
    "application/grpc-web+proto",
    "application/x-protobuf",
    "application/proto",
    "application/x-protobuffer",
)


def _unb64(c: Column) -> Column:
    return F.unbase64(c).cast("string")


def decode_dispatch(
    df: DataFrame,
    payload_col: str = "payload",
    full_percent_decode: bool = True,
) -> DataFrame:
    """Adds (decode_kind, decode_ok, decoded, decoded_size).

    ``full_percent_decode`` (default ON since r6) gives the form arm full
    application/x-www-form-urlencoded decoding (``F.try_url_decode``: %XX
    unescape + '+' -> space — the reference's ``parse_qs`` value
    semantics, nodes.py:307-323); False falls back to the legacy
    '+'-to-space-only normalization. The oracle dialect (DuckDB 1.0) has
    no url_decode, so the driver gate mirrors the decode with a closed
    replace chain over the escape set its corpus generates (%6B/%20) —
    exact there because decoded text re-introduces no '%' (see
    q_decode_dispatch); arbitrary escapes are pinned against
    urllib.parse.unquote_plus in pytest instead. The dispatch gate
    ensures every '%' opens a valid %XX escape either way, so the try_
    variant's null branch never fires on dispatched rows (coalesce kept
    as belt-and-braces). Only the form arm's ``decoded``/``decoded_size``
    change with the flag."""
    p = F.col(payload_col)
    is_gzip_garbled = p.startswith(GZIP_GARBLED_PREFIX)
    is_data = p.startswith("data:")
    duri_hdr = F.split_part(p, F.lit(","), F.lit(1))
    duri_body = F.split_part(p, F.lit(","), F.lit(2))
    duri_ok = duri_body.rlike(B64_RE) & (F.length(duri_body) % 4 == 0)
    # blackbox mimetype arms: the data-URI header carries the declared
    # type in-band (RFC 2397) — the shape analogue of the reference's
    # mimetype dispatch for types it can only tag, not structurally parse
    duri_mime = F.split_part(F.substr(duri_hdr, F.lit(6)), F.lit(";"), F.lit(1))
    ion_text = p.startswith(ION_MARKER)
    ion_uri = is_data & duri_mime.startswith("application/x-amzn-ion")
    dns_uri = is_data & duri_mime.startswith("application/dns-message")
    pb_uri = is_data & duri_mime.isin(*PROTOBUF_MIMES)
    blackbox_uri = ion_uri | dns_uri | pb_uri
    # transport layer only: strip a declared ;base64 envelope, keep the
    # payload itself raw (the reference lib-decodes here; tag + keep-raw
    # is its no-lib failure path, posted_data_info 'Unable to decode')
    blackbox_decoded = F.when(
        duri_hdr.contains(";base64") & duri_ok, _unb64(duri_body)
    ).otherwise(duri_body)
    is_multipart = p.rlike(MULTIPART_RE)
    # the reference's normalization direction (nodes.py:386-390): leave a
    # payload containing any CRLF alone, else rewrite LF -> CRLF; parts are
    # then extracted against CRLF framing, so multiline part content keeps
    # the CRLFs the reference's decoder would see
    mp_norm = F.when(p.contains("\r\n"), p).otherwise(
        F.replace(p, F.lit("\n"), F.lit("\r\n"))
    )
    mp_parts = F.regexp_extract_all(mp_norm, F.lit(MULTIPART_PART_RE), 1)
    hexish = p.rlike(HEX_RE) & (F.length(p) % 2 == 0)
    b64ish = p.rlike(B64_RE) & (F.length(p) % 4 == 0)
    # blind-retry (re-pad) arm: pad-free payloads only; length % 4 == 1 is
    # unfixable and falls through to the raw arms (reference keeps raw text
    # on binascii.Error, nodes.py:290-294)
    b64_fixable = p.rlike(B64_NOPAD_RE) & (F.length(p) % 4 != 1) & (
        F.length(p) % 4 != 0
    )
    repadded = F.concat(p, F.repeat(F.lit("="), (4 - F.length(p) % 4) % 4))
    # single-trailing-'=' repair ('QUJD=' -> stripped body %4 == 0; the
    # reference's blind b'===' append decodes exactly this class)
    stripped = F.substr(p, F.lit(1), F.length(p) - 1)
    b64_trailpad = p.rlike("^[A-Za-z0-9+/]+=\\z") & (F.length(p) % 4 == 1)
    # urlsafe alphabet ('-'/'_' present distinguishes it from plain base64,
    # which already won above); same padded/fixable split as the +/ arm
    has_alt = F.contains(p, F.lit("-")) | F.contains(p, F.lit("_"))
    std = F.translate(p, "-_", "+/")
    u_padded = p.rlike(B64_URL_RE) & has_alt & (F.length(p) % 4 == 0)
    u_fixable = (
        p.rlike("^[A-Za-z0-9_-]+\\z")
        & has_alt
        & (F.length(p) % 4 != 1)
        & (F.length(p) % 4 != 0)
    )
    u_repadded = F.concat(std, F.repeat(F.lit("="), (4 - F.length(p) % 4) % 4))
    u_trailpad = (
        p.rlike("^[A-Za-z0-9_-]+=\\z") & has_alt & (F.length(p) % 4 == 1)
    )
    u_stripped = F.translate(stripped, "-_", "+/")
    # form grammar + every '%' must open a valid %XX escape (no lookahead:
    # strip valid escapes, then any surviving '%' is invalid)
    formish = p.rlike(FORM_RE) & ~F.contains(
        F.regexp_replace(p, "%[0-9A-Fa-f]{2}", ""), F.lit("%")
    )
    jsonish = p.startswith("{") | p.startswith("[")
    json_streamish = p.startswith("{") & p.rlike(JSON_STREAM_RE)
    xmlish = p.startswith("<")

    kind = (
        F.when(p == "", "empty")
        .when(is_gzip_garbled, "gzip_garbled")
        .when(ion_text | ion_uri, "ion")
        .when(dns_uri, "dns_wire")
        .when(pb_uri, "protobuf")
        .when(is_data & duri_hdr.contains(";base64"), "data_uri_b64")
        .when(is_data, "data_uri_raw")
        .when(is_multipart, "multipart")
        .when(hexish, "hex")
        .when(b64ish, "base64")
        .when(b64_fixable, "base64_padfix")
        .when(b64_trailpad, "base64_trailpad")
        .when(u_padded | u_fixable | u_trailpad, "base64_url")
        .when(formish, "form_urlencoded")
        .when(json_streamish, "json_stream")
        .when(jsonish, "json")
        .when(xmlish, "xml")
        .otherwise("plain")
    )
    decoded = (
        F.when(p == "", "")
        .when(is_gzip_garbled, p)
        .when(ion_text, p)
        .when(blackbox_uri, blackbox_decoded)
        .when(
            is_data & duri_hdr.contains(";base64"),
            F.when(duri_ok, _unb64(duri_body)).otherwise(""),
        )
        .when(is_data, duri_body)
        .when(is_multipart, F.array_join(mp_parts, "\n"))
        .when(hexish, F.unhex(p).cast("string"))
        .when(b64ish, _unb64(p))
        .when(b64_fixable, _unb64(repadded))
        .when(b64_trailpad, _unb64(stripped))
        .when(u_padded, _unb64(std))
        .when(u_fixable, _unb64(u_repadded))
        .when(u_trailpad, _unb64(u_stripped))
        .when(
            formish,
            F.coalesce(F.try_url_decode(p), F.translate(p, "+", " "))
            if full_percent_decode
            else F.translate(p, "+", " "),
        )
        .when(
            json_streamish,
            F.concat(F.lit("["), F.regexp_replace(p, "\\}\\{", "},{"), F.lit("]")),
        )
        .otherwise(p)
    )
    ok = (
        F.when(is_gzip_garbled, F.lit(False))
        .when(ion_text | blackbox_uri, F.lit(False))
        .when(is_data & duri_hdr.contains(";base64"), duri_ok)
        .when(is_multipart, F.size(mp_parts) > 0)
        .otherwise(F.lit(True))
    )
    size = F.when(decoded.isNull() | (decoded == ""), F.lit(0)).otherwise(
        F.length(decoded)
    )
    return (
        df.withColumn("decode_kind", kind)
        .withColumn("decode_ok", ok)
        .withColumn("decoded", decoded)
        .withColumn("decoded_size", size.cast("long"))
    )


# --------------------------------------------------------------------------
# Structural second tier for the blackbox arms (r5 VERDICT #3)
# --------------------------------------------------------------------------
# The JVM CASE cascade above tags ion / dns_wire / protobuf payloads and
# keeps them raw — the reference's *no-lib* failure path. Its lib path
# actually decodes (reference nodes.py:361-375 simpleion, 400-413
# blackboxprotobuf, 428-433 dns.message.from_wire). This tier upgrades
# those rows:
#
#   * dns_wire  — pure-stdlib RFC 1035 wire parse (header + question
#                 section label walk). No third-party lib needed; the
#                 output is a canonical JSON rendering (documented
#                 divergence: dnspython's to_text() layout differs, the
#                 parsed structure is the same).
#   * protobuf  — pure-stdlib schema-less field walk (varint tags, wire
#                 types 0/1/2/5), the same idea blackboxprotobuf
#                 implements: fields keyed by number, length-delimited
#                 values as UTF-8 when cleanly decodable else hex.
#   * ion       — import-gated amazon.ion mirroring the reference's
#                 simpleion.loads -> dumps(binary=False, indent="\t");
#                 stays blackbox when the lib is absent (it is absent in
#                 this container — the pytest is skip-marked, and unlike
#                 the soup-lxml case there is no behavioral parity claim:
#                 the arm only ever *upgrades* ok=False rows).
#
# Scale shape: this is a second PASS, not part of the hot CASE cascade —
# apply it after decode_dispatch and only blackbox-tagged rows enter the
# Python batch (a vectorized pandas_udf short-circuits on kind), so the
# Arrow cost is proportional to the rare blackbox fraction, exactly like
# the soup operator's event-parser engine.


def dns_wire_structural(wire: bytes) -> str | None:
    """RFC 1035 wire-format parse: 12-byte header + question section.
    Returns canonical JSON, or None when the payload is not a well-formed
    message (caller keeps the blackbox row unchanged)."""
    import json as _json  # noqa: PLC0415
    import struct as _struct  # noqa: PLC0415

    try:
        if len(wire) < 12:
            return None
        msg_id, flags, qd, an, ns, ar = _struct.unpack(">HHHHHH", wire[:12])
        off = 12
        questions = []
        for _ in range(qd):
            labels = []
            while True:
                if off >= len(wire):
                    return None
                ln = wire[off]
                if ln == 0:
                    off += 1
                    break
                if ln >= 0xC0:  # compression pointer: invalid in a question
                    return None
                off += 1
                if off + ln > len(wire):
                    return None
                label = wire[off : off + ln]
                if not label.isascii():
                    return None
                labels.append(label.decode("ascii"))
                off += ln
            if off + 4 > len(wire):
                return None
            qtype, qclass = _struct.unpack(">HH", wire[off : off + 4])
            off += 4
            questions.append(
                {"name": ".".join(labels), "type": qtype, "class": qclass}
            )
        return _json.dumps(
            {
                "id": msg_id,
                "flags": flags,
                "questions": questions,
                "ancount": an,
                "nscount": ns,
                "arcount": ar,
            },
            separators=(",", ":"),
        )
    except Exception:  # noqa: BLE001 — malformed wire keeps blackbox
        return None


def protobuf_structural(data: bytes) -> str | None:
    """Schema-less protobuf field walk (the blackboxprotobuf idea): parse
    <tag varint, value> pairs for wire types 0 (varint), 1 (fixed64),
    2 (length-delimited), 5 (fixed32). Length-delimited values render as
    UTF-8 when cleanly decodable, else lowercase hex. Repeated fields
    collect into lists. Returns canonical JSON or None."""
    import json as _json  # noqa: PLC0415
    import struct as _struct  # noqa: PLC0415

    def varint(buf: bytes, off: int) -> tuple[int, int] | None:
        val = 0
        shift = 0
        while True:
            if off >= len(buf) or shift > 63:
                return None
            b = buf[off]
            val |= (b & 0x7F) << shift
            off += 1
            if not b & 0x80:
                return (val, off)
            shift += 7

    try:
        if not data:
            return None
        fields: dict[str, list] = {}
        off = 0
        while off < len(data):
            r = varint(data, off)
            if r is None:
                return None
            tag, off = r
            field_no, wt = tag >> 3, tag & 7
            if field_no == 0:
                return None
            if wt == 0:
                r = varint(data, off)
                if r is None:
                    return None
                val, off = r
            elif wt == 1:
                if off + 8 > len(data):
                    return None
                val = _struct.unpack("<q", data[off : off + 8])[0]
                off += 8
            elif wt == 2:
                r = varint(data, off)
                if r is None:
                    return None
                ln, off = r
                if off + ln > len(data):
                    return None
                raw = data[off : off + ln]
                off += ln
                try:
                    val = raw.decode("utf-8")
                    if not val.isprintable() and val != "":
                        val = raw.hex()
                except UnicodeDecodeError:
                    val = raw.hex()
            elif wt == 5:
                if off + 4 > len(data):
                    return None
                val = _struct.unpack("<i", data[off : off + 4])[0]
                off += 4
            else:  # wire types 3/4 (groups, deprecated) and 6/7: reject
                return None
            fields.setdefault(str(field_no), []).append(val)
        if not fields:
            return None
        flat = {k: (v[0] if len(v) == 1 else v) for k, v in fields.items()}
        return _json.dumps(flat, separators=(",", ":"), sort_keys=True)
    except Exception:  # noqa: BLE001
        return None


def ion_structural(text: str) -> str | None:
    """Import-gated Ion decode mirroring reference nodes.py:364-371:
    simpleion.loads -> dumps(binary=False, indent='\\t'). Returns None
    when amazon.ion is not importable (this container) or the payload
    does not parse — the row stays blackbox either way."""
    try:
        from amazon.ion import simpleion  # noqa: PLC0415
    except ImportError:
        return None
    try:
        return simpleion.dumps(simpleion.loads(text), binary=False, indent="\t")
    except Exception:  # noqa: BLE001
        return None


def _blackbox_bytes(payload: str) -> bytes | None:
    """Raw wire bytes for a blackbox payload, recovered from the ORIGINAL
    payload string (not tier-1 ``decoded``): the transport is ASCII — a
    data-URI with an optional ;base64 envelope — so decoding it here is
    byte-exact, where the JVM's binary->string cast of the same bytes is
    lossy for non-UTF-8 wire data (and Arrow refuses to ship such strings
    to the Python worker at all)."""
    import base64  # noqa: PLC0415

    if not payload.startswith("data:"):
        return payload.encode("utf-8", "replace")
    hdr, _, body = payload.partition(",")
    if ";base64" in hdr:
        try:
            pad = (-len(body)) % 4
            return base64.b64decode(body + "=" * pad, validate=True)
        except Exception:  # noqa: BLE001 — invalid transport: stay blackbox
            return None
    return body.encode("utf-8", "replace")


def decode_structural(
    df: DataFrame,
    payload_col: str = "payload",
    kind_col: str = "decode_kind",
    decoded_col: str = "decoded",
    ok_col: str = "decode_ok",
) -> DataFrame:
    """Upgrade blackbox-tagged rows in place: where a structural parse
    succeeds, ``decoded`` becomes the canonical JSON/Ion text,
    ``decode_ok`` flips to true and ``structurally_decoded`` marks the
    row; every other row passes through bit-unchanged. The pandas_udf
    short-circuits per batch when no blackbox rows are present, so the
    common case pays one vectorized isin() and no Python parsing. It
    reads the ORIGINAL payload column (ASCII transport — Arrow-safe),
    never tier-1 ``decoded`` (whose binary->string cast can carry
    non-UTF-8 sequences Arrow cannot transfer)."""
    import pandas as pd  # noqa: PLC0415

    def _upgrade(kind: pd.Series, payload: pd.Series) -> pd.Series:
        mask = kind.isin(("ion", "dns_wire", "protobuf"))
        if not mask.any():
            return pd.Series([None] * len(kind), dtype=object)
        out = []
        for k, p in zip(kind.tolist(), payload.tolist()):
            if p is None or k not in ("ion", "dns_wire", "protobuf"):
                out.append(None)
            elif k == "ion":
                if p.startswith(ION_MARKER):
                    out.append(ion_structural(p))
                else:
                    raw = _blackbox_bytes(p)
                    out.append(
                        None
                        if raw is None
                        else ion_structural(raw.decode("utf-8", "replace"))
                    )
            else:
                raw = _blackbox_bytes(p)
                if raw is None:
                    out.append(None)
                elif k == "dns_wire":
                    out.append(dns_wire_structural(raw))
                else:
                    out.append(protobuf_structural(raw))
        return pd.Series(out, dtype=object)

    # local-scope definition: the pd.Series hints resolve against the
    # enclosing function's locals (postponed-annotation eval is off for
    # this nested def), so pandas can stay a function-local import
    _upgrade.__annotations__ = {"kind": pd.Series, "payload": pd.Series,
                                "return": pd.Series}
    upgrade = F.pandas_udf(_upgrade, "string")

    up = F.when(
        F.col(kind_col).isin("ion", "dns_wire", "protobuf"),
        upgrade(F.col(kind_col), F.col(payload_col)),
    )
    return (
        df.withColumn("_structural", up)
        .withColumn(
            decoded_col, F.coalesce(F.col("_structural"), F.col(decoded_col))
        )
        .withColumn(
            ok_col, F.when(F.col("_structural").isNotNull(), True).otherwise(F.col(ok_col))
        )
        .withColumn("structurally_decoded", F.col("_structural").isNotNull())
        .drop("_structural")
    )
