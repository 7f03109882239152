"""CRAM 3.0 byte-level spec corners (VERDICT r4 #7).

Hand-built containers exercising corners the adversarial corpus
(test_cram_adversarial.py) did not yet reach:

  - bzip2 / lzma / raw / gzip block-compression MIXED inside one slice
  - ITF8 boundary values: the 5-byte form, NEGATIVE AP deltas (a
    position stepping backwards within a slice), 5-byte DL
  - LTF8 multi-byte record counters (slice + container headers)
  - multi-container reference-id switches (0 -> 1, and multiref -2
    followed by single-ref)
  - slice headers whose content-id list disagrees with the blocks that
    follow (and with the container landmark table): both decoders read
    blocks sequentially and must tolerate it IDENTICALLY

Every fixture must decode (or fail loudly) identically through the
python record model and the native slice decoder, and — where it
decodes — through the direct-stats route vs the legacy route.
"""

import bz2
import lzma
import os
import struct
import zlib

import numpy as np
import pytest

from coverm_tpu.io import native
from coverm_tpu.io.cram import (CRAM_EOF, CT_COMP_HEADER, CT_CORE,
                                CT_EXTERNAL, CT_SLICE_HEADER, M_BZIP2,
                                M_GZIP, M_LZMA, M_RAW, CramFormatError,
                                cram_to_bam_data, read_itf8, write_block,
                                write_container, write_itf8, write_ltf8)

from test_cram_adversarial import (FILE_HEAD, SM, Enc, comp_header_bytes,
                                   sam_header_container, slice_hdr)

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")


def write_block_method(method, ctype, cid, data: bytes) -> bytes:
    """Block writer for methods write_block does not emit (bzip2/lzma)."""
    if method == M_RAW:
        raw = data
    elif method == M_GZIP:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        raw = co.compress(data) + co.flush()
    elif method == M_BZIP2:
        raw = bz2.compress(data)
    elif method == M_LZMA:
        raw = lzma.compress(data)
    else:
        raise AssertionError(method)
    body = bytes([method, ctype]) + write_itf8(cid) \
        + write_itf8(len(raw)) + write_itf8(len(data)) + raw
    return body + struct.pack("<I", zlib.crc32(body))


def _decode_both(raw):
    """(outcome, payload) through python and native decoders — must be
    identical (the native decoder falls back per slice, so a native
    reject still ends at the python bytes)."""
    outs = []
    for v in ("0", "1"):
        os.environ["COVERM_TPU_NATIVE_CRAM"] = v
        try:
            outs.append(("ok", cram_to_bam_data(raw)))
        except CramFormatError:
            outs.append(("cram_error", None))
        finally:
            os.environ.pop("COVERM_TPU_NATIVE_CRAM", None)
    assert outs[0][0] == outs[1][0], (outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
    return outs[0]


def _routes_agree(tmp_path, raw, name="x.cram"):
    """Direct-stats vs legacy scan agreement on a written file."""
    from test_cram_stats_path import _scan
    from test_fastscan import assert_scan_equal

    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(raw)
    direct, used = _scan(p)
    legacy, _ = _scan(p, env={"COVERM_TPU_CRAM_STATS": "0"})
    assert used
    assert_scan_equal(direct, legacy)
    return direct


def _simple_slice(records, ref_id=0, counter=0, method_of=None,
                  content_ids_override=None, extra_tag_nm=True,
                  ap_vals=None):
    """One-slice container: records = [(name, flag, rl, pos)];
    NM:c tag via the tag dictionary when extra_tag_nm."""
    e = Enc()
    ints = ["BF", "CF", "RL", "AP", "MF", "NS", "NP", "TS", "TL", "FN",
            "MQ"]
    for i, k in enumerate(ints):
        e.use_ext(k, 10 + i)
    e.use_const("RG", -1)
    e.use_stop("RN", 40)
    for j, (name, flag, rl, pos) in enumerate(records):
        e.put("BF", flag)
        e.put("CF", 2)  # detached
        e.put("RL", rl)
        e.put("AP", pos if ap_vals is None else ap_vals[j])
        e.put_bytes("RN", name)
        e.put("MF", 0)
        e.put("NS", -1)
        e.put("NP", 0)
        e.put("TS", 0)
        e.put("TL", 0)
        e.put("FN", 0)
        e.put("MQ", 60)
    series = dict(e.series)
    # tag encodings block: one line with NM:c, external value stream 50
    if extra_tag_nm:
        nm_blob = bytes([1] * len(records))
        e.ext[50] = bytearray(nm_blob)
    comp = _comp_with_tags(series, extra_tag_nm)
    blocks = e.blocks()
    content_ids = sorted(e.ext.keys())
    if content_ids_override is not None:
        content_ids = content_ids_override
    sl = slice_hdr(ref_id, min(p for *_x, p in records), 200,
                   len(records), counter, len(blocks), content_ids)
    method_of = method_of or {}
    cblocks = [write_block(M_RAW, CT_COMP_HEADER, 0, comp),
               write_block(M_RAW, CT_SLICE_HEADER, 0, sl)]
    for b in blocks:
        # re-encode chosen external blocks with a different method
        m, ct = b[0], b[1]
        cid, p2 = read_itf8(b, 2)
        if ct == CT_EXTERNAL and cid in method_of:
            _csz, p2 = read_itf8(b, p2)
            rsize, p2 = read_itf8(b, p2)
            data = b[p2:p2 + _csz]  # M_RAW blocks: payload verbatim
            cblocks.append(write_block_method(method_of[cid], ct, cid,
                                              data))
        else:
            cblocks.append(b)
    return write_container(ref_id, min(p for *_x, p in records), 200,
                           len(records), counter,
                           sum(r[2] for r in records), cblocks)


def _comp_with_tags(series_enc, with_nm):
    from coverm_tpu.io.cram import (byte_array_len_encoding, ext_encoding,
                                    huffman_const_encoding)
    td = write_itf8(len(b"NMc\x00")) + b"NMc\x00" if with_nm \
        else write_itf8(1) + b"\x00"
    entries = [(b"RN", bytes([1])), (b"AP", bytes([0])),
               (b"RR", bytes([0])), (b"SM", SM), (b"TD", td)]
    body = write_itf8(len(entries)) + b"".join(k + v for k, v in entries)
    pres = write_itf8(len(body)) + body
    body = write_itf8(len(series_enc)) + b"".join(
        k.encode() + v for k, v in series_enc.items())
    dse = write_itf8(len(body)) + body
    if with_nm:
        key = (ord("N") << 16) | (ord("M") << 8) | ord("c")
        enc = byte_array_len_encoding(huffman_const_encoding(1),
                                      ext_encoding(50))
        body = write_itf8(1) + write_itf8(key) + enc
    else:
        body = write_itf8(0)
    te = write_itf8(len(body)) + body
    return pres + dse + te


HDR2 = sam_header_container("@SQ\tSN:cA\tLN:1000\n@SQ\tSN:cB\tLN:1000\n")


def test_block_compression_mix_in_one_slice(tmp_path):
    """bzip2 RN + lzma AP + raw/gzip others inside ONE slice."""
    recs = [(b"a%d" % j, 0, 10, 20 + 3 * j) for j in range(40)]
    cont = _simple_slice(recs, method_of={40: M_BZIP2, 13: M_LZMA,
                                          50: M_GZIP})
    raw = FILE_HEAD + HDR2 + cont + CRAM_EOF
    st, bam = _decode_both(raw)
    assert st == "ok" and bam.count(b"a1\x00") >= 1
    _routes_agree(tmp_path, raw)


def test_itf8_negative_ap_delta():
    """ap_delta slices may step BACKWARD: the delta is a signed 5-byte
    ITF8.  Both decoders must reconstruct the same positions."""
    e = Enc()
    ints = ["BF", "CF", "RL", "AP", "MF", "NS", "NP", "TS", "TL", "FN",
            "MQ"]
    for i, k in enumerate(ints):
        e.use_ext(k, 10 + i)
    e.use_const("RG", -1)
    e.use_stop("RN", 40)
    for name, ap in ((b"x1", 100), (b"x2", -50), (b"x3", 7)):
        e.put("BF", 0)
        e.put("CF", 2)
        e.put("RL", 10)
        e.put("AP", ap)   # write_itf8 wraps negatives to the 5-byte form
        e.put_bytes("RN", name)
        e.put("MF", 0)
        e.put("NS", -1)
        e.put("NP", 0)
        e.put("TS", 0)
        e.put("TL", 0)
        e.put("FN", 0)
        e.put("MQ", 60)
    comp = comp_header_bytes(e.series, rr=False, sm=SM, ap_delta=True)
    blocks = e.blocks()
    sl = slice_hdr(0, 0, 300, 3, 0, len(blocks), sorted(e.ext.keys()))
    cont = write_container(0, 0, 300, 3, 0, 30, [
        write_block(M_RAW, CT_COMP_HEADER, 0, comp),
        write_block(M_RAW, CT_SLICE_HEADER, 0, sl)] + blocks)
    raw = FILE_HEAD + sam_header_container("@SQ\tSN:cA\tLN:1000\n") \
        + cont + CRAM_EOF
    st, bam = _decode_both(raw)
    assert st == "ok"
    # positions: 0+100, 100-50=50, 50+7=57 (1-based) -> pos0 99, 49, 56
    pos = [struct.unpack_from("<i", bam, off + 8)[0]
           for off in _record_offsets(bam)]
    assert pos == [99, 49, 56]


def _record_offsets(bam):
    (l_text,) = struct.unpack_from("<i", bam, 4)
    p = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", bam, p)
    p += 4
    for _ in range(n_ref):
        (ln,) = struct.unpack_from("<i", bam, p)
        p += 4 + ln + 4
    offs = []
    while p + 4 <= len(bam):
        (bs,) = struct.unpack_from("<I", bam, p)
        offs.append(p)
        p += 4 + bs
    return offs


def test_ltf8_multibyte_record_counter(tmp_path):
    """A record counter needing a multi-byte LTF8 (2^33) must decode
    identically (generated names embed it on RN-less files; here RN is
    preserved so only parsing is at stake)."""
    e = Enc()
    ints = ["BF", "CF", "RL", "AP", "MF", "NS", "NP", "TS", "TL", "FN",
            "MQ"]
    for i, k in enumerate(ints):
        e.use_ext(k, 10 + i)
    e.use_const("RG", -1)
    e.use_stop("RN", 40)
    for name, pos in ((b"y1", 30), (b"y2", 60)):
        e.put("BF", 0)
        e.put("CF", 2)
        e.put("RL", 10)
        e.put("AP", pos)
        e.put_bytes("RN", name)
        e.put("MF", 0)
        e.put("NS", -1)
        e.put("NP", 0)
        e.put("TS", 0)
        e.put("TL", 0)
        e.put("FN", 0)
        e.put("MQ", 60)
    comp = comp_header_bytes(e.series, rr=False, sm=SM)
    blocks = e.blocks()
    counter = 1 << 33
    sl = (write_itf8(0) + write_itf8(30) + write_itf8(200)
          + write_itf8(2) + write_ltf8(counter)
          + write_itf8(len(blocks)) + write_itf8(len(e.ext))
          + b"".join(write_itf8(c) for c in sorted(e.ext.keys()))
          + write_itf8(-1) + b"\x00" * 16)
    cont = write_container(0, 30, 200, 2, counter, 20, [
        write_block(M_RAW, CT_COMP_HEADER, 0, comp),
        write_block(M_RAW, CT_SLICE_HEADER, 0, sl)] + blocks)
    raw = FILE_HEAD + sam_header_container("@SQ\tSN:cA\tLN:1000\n") \
        + cont + CRAM_EOF
    st, bam = _decode_both(raw)
    assert st == "ok" and b"y2\x00" in bam


def test_multi_container_ref_id_switch(tmp_path):
    """Container 1 on cA, container 2 on cB: the direct route's
    cross-slice sortedness tracking must accept the switch and the
    per-contig stats must land on the right contigs."""
    c1 = _simple_slice([(b"a%d" % j, 0, 10, 10 + 5 * j)
                        for j in range(30)], ref_id=0, counter=0)
    c2 = _simple_slice([(b"b%d" % j, 0, 10, 5 + 4 * j)
                        for j in range(25)], ref_id=1, counter=30)
    raw = FILE_HEAD + HDR2 + c1 + c2 + CRAM_EOF
    st, bam = _decode_both(raw)
    assert st == "ok"
    d = _routes_agree(tmp_path, raw, "switch.cram")
    assert d.reads_all[0] == 30 and d.reads_all[1] == 25


def test_ref_id_regression_across_containers_unsorted(tmp_path):
    c1 = _simple_slice([(b"a0", 0, 10, 10)], ref_id=1, counter=0)
    c2 = _simple_slice([(b"b0", 0, 10, 10)], ref_id=0, counter=1)
    raw = FILE_HEAD + HDR2 + c1 + c2 + CRAM_EOF
    p = str(tmp_path / "reg.cram")
    with open(p, "wb") as f:
        f.write(raw)
    from coverm_tpu.scan import BamSortingError
    from test_cram_stats_path import _scan
    for env in ({}, {"COVERM_TPU_CRAM_STATS": "0"}):
        with pytest.raises(BamSortingError):
            _scan(p, env=env)


def test_content_id_list_disagrees_with_blocks(tmp_path):
    """A slice header listing WRONG content ids (and therefore
    disagreeing with the container landmark table) while the actual
    blocks carry the right ids: both decoders walk blocks sequentially
    and must tolerate it identically (htslib seeks by landmarks; a
    sequential reader need not)."""
    recs = [(b"c%d" % j, 0, 10, 15 + 6 * j) for j in range(20)]
    good = _simple_slice(recs)
    bad = _simple_slice(recs, content_ids_override=[77, 78, 79])
    raw_good = FILE_HEAD + HDR2 + good + CRAM_EOF
    raw_bad = FILE_HEAD + HDR2 + bad + CRAM_EOF
    st_g, bam_g = _decode_both(raw_good)
    st_b, bam_b = _decode_both(raw_bad)
    assert st_g == st_b == "ok"
    assert bam_g == bam_b  # the id list is advisory for sequential reads
    _routes_agree(tmp_path, raw_bad, "badids.cram")


def test_itf8_five_byte_forms_roundtrip():
    """ITF8 5-byte boundary values through the python reader."""
    for v in (0x0FFFFFFF, 0x10000000, 0x7FFFFFFF, -1, -2**31):
        b = write_itf8(v)
        got, off = read_itf8(b, 0)
        assert off == len(b)
        assert got == v if v >= 0 else got == v  # signed round-trip
        assert got == (v if v >= 0 else v)


def test_ltf8_boundary_roundtrip():
    from coverm_tpu.io.cram import read_ltf8
    for v in (0, 0x7F, 0x80, 0x3FFF, 1 << 33, (1 << 56) - 1, 1 << 62):
        b = write_ltf8(v)
        got, off = read_ltf8(b, 0)
        assert off == len(b) and got == v, v
