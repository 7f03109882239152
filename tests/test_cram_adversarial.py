"""Adversarial CRAM 3.0 conformance (VERDICT r3 #3).

Every container here is HAND-CONSTRUCTED — none of them can come out of
the in-repo writer (io/cram.py sam_to_cram_bytes), which always picks
external/huffman-const/BETA encodings, verbatim 'b' base features and
RR=0.  These fixtures exercise the decoder branches a real htslib
writer (or a hostile file) can produce:

  - BETA / GAMMA / SUBEXP integer-series codecs driving the record model
  - HUFFMAN tables with symbols listed in non-canonical order
  - multi-slice containers
  - reference-based reads (RR=1): implicit match fill + 'X' substitution
    through the substitution matrix, decoded against an EMBEDDED
    reference block
  - RR=1 without an embedded reference: coverage decode still exact,
    require_seq paths fail loudly
  - detached-mate TLEN/PNEXT corners, NF same-position tie
  - RG:Z reconstruction from the read-group index
  - CRAM v2 rejection; KeyError/ValueError corruption -> CramFormatError

Reference for behavior: htslib semantics via rust-htslib
(/root/reference/src/lib.rs:138-180)."""

import struct

import pytest

from coverm_tpu.io.cram import (CRAM_EOF, CRAM_MAGIC, CT_COMP_HEADER,
                                CT_CORE, CT_EXTERNAL, CT_SLICE_HEADER,
                                C_BETA, C_GAMMA, C_SUBEXP, BitWriter,
                                CramFormatError, HuffmanCodec, M_RAW,
                                byte_array_stop_encoding, cram_to_bam_data,
                                encode_encoding, ext_encoding,
                                huffman_const_encoding, iter_cram_containers,
                                write_block, write_container, write_itf8)

# ---------------------------------------------------------------- builders

FILE_HEAD = CRAM_MAGIC + bytes([3, 0]) + b"advtest".ljust(20, b"\x00")


def sam_header_container(sam_text: str) -> bytes:
    payload = struct.pack("<i", len(sam_text.encode())) + sam_text.encode()
    blk = write_block(M_RAW, 0, 0, payload)  # CT_FILE_HEADER
    return write_container(-1, 0, 0, 0, 0, 0, [blk])


def comp_header_bytes(series_enc: dict, rr: bool, sm: bytes,
                      ap_delta: bool = False) -> bytes:
    entries = [(b"RN", bytes([1])), (b"AP", bytes([1 if ap_delta else 0])),
               (b"RR", bytes([1 if rr else 0])), (b"SM", sm),
               (b"TD", write_itf8(1) + b"\x00")]
    body = write_itf8(len(entries)) + b"".join(k + v for k, v in entries)
    pres = write_itf8(len(body)) + body
    body = write_itf8(len(series_enc)) + b"".join(
        k.encode() + v for k, v in series_enc.items())
    dse = write_itf8(len(body)) + body
    body = write_itf8(0)
    te = write_itf8(len(body)) + body
    return pres + dse + te


# LTF-8 writer for small non-negative values: one byte < 0x80
def ltf8_small(v: int) -> bytes:
    assert 0 <= v < 0x80
    return bytes([v])


def slice_hdr(ref_id, start, span, n_records, counter, n_blocks,
              content_ids, embed_id=-1) -> bytes:
    return (write_itf8(ref_id) + write_itf8(start) + write_itf8(span)
            + write_itf8(n_records) + ltf8_small(counter)
            + write_itf8(n_blocks) + write_itf8(len(content_ids))
            + b"".join(write_itf8(c) for c in content_ids)
            + write_itf8(embed_id) + b"\x00" * 16)


class Enc:
    """Series encoder mirroring the decoder's exact decode order, so the
    shared core bit stream interleaves correctly."""

    def __init__(self):
        self.core = BitWriter()
        self.ext = {}
        self.series = {}  # key -> encoding bytes for the comp header

    def _blob(self, cid):
        return self.ext.setdefault(cid, bytearray())

    def use_ext(self, key, cid):
        self.series[key] = ext_encoding(cid)
        self._put_fns = getattr(self, "_put_fns", {})
        self._put_fns[key] = ("ext", cid)

    def use_stop(self, key, cid, stop=0):
        self.series[key] = byte_array_stop_encoding(stop, cid)
        self._put_fns = getattr(self, "_put_fns", {})
        self._put_fns[key] = ("stop", (cid, stop))

    def use_beta(self, key, offset, nbits):
        self.series[key] = encode_encoding(
            C_BETA, write_itf8(offset) + write_itf8(nbits))
        self._put_fns = getattr(self, "_put_fns", {})
        self._put_fns[key] = ("beta", (offset, nbits))

    def use_gamma(self, key, offset):
        self.series[key] = encode_encoding(C_GAMMA, write_itf8(offset))
        self._put_fns = getattr(self, "_put_fns", {})
        self._put_fns[key] = ("gamma", offset)

    def use_subexp(self, key, offset, k):
        self.series[key] = encode_encoding(
            C_SUBEXP, write_itf8(offset) + write_itf8(k))
        self._put_fns = getattr(self, "_put_fns", {})
        self._put_fns[key] = ("subexp", (offset, k))

    def use_huffman(self, key, symbols, lengths):
        # symbols deliberately passed in NON-sorted order: canonical
        # code assignment must not depend on listing order
        params = write_itf8(len(symbols)) \
            + b"".join(write_itf8(s) for s in symbols) \
            + write_itf8(len(lengths)) \
            + b"".join(write_itf8(x) for x in lengths)
        self.series[key] = encode_encoding(3, params)  # C_HUFFMAN
        self._put_fns = getattr(self, "_put_fns", {})
        self._put_fns[key] = ("huff", HuffmanCodec(symbols, lengths))

    def use_const(self, key, value):
        self.series[key] = huffman_const_encoding(value)
        self._put_fns = getattr(self, "_put_fns", {})
        self._put_fns[key] = ("const", value)

    def put(self, key, v):
        kind, p = self._put_fns[key]
        if kind == "ext":
            self._blob(p).extend(write_itf8(v))
        elif kind == "beta":
            off, nb = p
            self.core.write_bits(v + off, nb)
        elif kind == "gamma":
            u = v + p
            assert u >= 1
            n = u.bit_length() - 1
            self.core.write_bits(0, n)
            self.core.write_bits(u, n + 1)
        elif kind == "subexp":
            off, k = p
            u = v + off
            if u < (1 << k):
                self.core.write_bits(0, 1)
                self.core.write_bits(u, k)
            else:
                b = u.bit_length() - 1
                i = b - k + 1
                self.core.write_bits((1 << i) - 1, i)
                self.core.write_bits(0, 1)
                self.core.write_bits(u - (1 << b), b)
        elif kind == "huff":
            p.encode(self.core, v)
        elif kind == "const":
            assert v == p, (key, v, p)
        else:
            raise AssertionError(kind)

    def put_bytes(self, key, data: bytes):
        kind, p = self._put_fns[key]
        assert kind == "stop"
        cid, stop = p
        self._blob(cid).extend(data + bytes([stop]))

    def blocks(self):
        out = [write_block(M_RAW, CT_CORE, 0, self.core.getvalue())]
        for cid, blob in sorted(self.ext.items()):
            out.append(write_block(M_RAW, CT_EXTERNAL, cid, bytes(blob)))
        return out


# SM byte 0x87 = 0b10_00_01_11: for each reference base, the other four
# bases (ACGTN order) get codes 2,0,1,3 -> code 1 selects the SECOND
# other base (T for ref A; G for ref T; ...)
SM = bytes([0x87] * 5)

REF = b"ACGTACGTACGTACGTACGTACGTACGTAC"  # positions 11..40 (1-based)


def build_two_read_cram(style: str, embed_ref: bool = True,
                        rr: bool = True) -> bytes:
    """Two mapped reads on contig cA with RR=1 reference-coded bases:
    r1 pos 11 10M with an X substitution at read offset 3; r2 pos 31
    4M 2D 4M, all implicit-match bases."""
    e = Enc()
    ints = ["BF", "CF", "RL", "AP", "MF", "NS", "NP", "TS", "TL", "FN",
            "FP", "BS", "DL", "MQ"]
    if style == "external":
        for i, k in enumerate(ints):
            e.use_ext(k, 10 + i)
    elif style == "beta":
        for k in ints:
            e.use_beta(k, 1, 16)
    elif style == "gamma":
        for k in ints:
            e.use_gamma(k, 2)
    elif style == "subexp":
        for k in ints:
            e.use_subexp(k, 2, 3)
    elif style == "huffman":
        # per-series value sets, symbols listed unsorted
        vals = {"BF": [0], "CF": [2], "RL": [10, 8], "AP": [31, 11],
                "MF": [0], "NS": [-1], "NP": [0], "TS": [0], "TL": [0],
                "FN": [1], "FP": [4, 5], "BS": [1], "DL": [2], "MQ": [60]}
        for k in ints:
            vs = vals[k]
            if len(vs) == 1:
                e.use_const(k, vs[0])
            else:
                e.use_huffman(k, [vs[1], vs[0]], [1, 1])
    else:
        raise AssertionError(style)
    e.use_const("RG", -1)
    e.use_stop("RN", 40)
    e.use_ext("FC", 41)

    def rec(name, flag, rl, ap, fn_feats, mapq):
        e.put("BF", flag)
        e.put("CF", 2)  # detached
        e.put("RL", rl)
        e.put("AP", ap)
        # RG const -1
        e.put_bytes("RN", name)
        e.put("MF", 0)
        e.put("NS", -1)
        e.put("NP", 0)
        e.put("TS", 0)
        e.put("TL", 0)
        e.put("FN", len(fn_feats))
        for code, fp, val in fn_feats:
            e._blob(41).append(ord(code))
            e.put("FP", fp)
            if code == "X":
                e.put("BS", val)
            elif code == "D":
                e.put("DL", val)
        e.put("MQ", mapq)

    rec(b"q1", 0, 10, 11, [("X", 4, 1)], 60)
    rec(b"q2", 0, 8, 31, [("D", 5, 2)], 60)

    content_ids = sorted(e.ext.keys())
    embed_id = -1
    blocks = e.blocks()
    if embed_ref:
        embed_id = 99
        blocks.append(write_block(M_RAW, CT_EXTERNAL, 99, REF))
        content_ids = sorted(content_ids + [99])
    comp = comp_header_bytes(e.series, rr=rr, sm=SM)
    sl = slice_hdr(0, 11, 30, 2, 0, len(blocks), content_ids,
                   embed_id=embed_id)
    cblocks = [write_block(M_RAW, CT_COMP_HEADER, 0, comp),
               write_block(M_RAW, CT_SLICE_HEADER, 0, sl)] + blocks
    cont = write_container(0, 11, 30, 2, 0, 18, cblocks)
    return (FILE_HEAD + sam_header_container("@SQ\tSN:cA\tLN:1000\n")
            + cont + CRAM_EOF)


def decode_records(raw: bytes):
    recs = []
    for sam_text, rr in iter_cram_containers(raw):
        if rr is not None:
            recs.extend(rr)
    return recs


# ------------------------------------------------------------------- tests

@pytest.mark.parametrize("style",
                         ["external", "beta", "gamma", "subexp", "huffman"])
def test_codec_styles_decode_identically(style):
    recs = decode_records(build_two_read_cram(style))
    assert len(recs) == 2
    r1, r2 = recs
    assert (r1.name, r1.pos, r1.rl, r1.mapq) == (b"q1", 11, 10, 60)
    assert r1.cigar == [(0, 10)]
    # implicit bases from the embedded reference; X at read offset 3
    # substitutes ref 'T' with code 1 -> 'G' under SM=0x87
    assert r1.seq == b"ACGGACGTAC"
    assert not r1.seq_incomplete
    assert (r2.name, r2.pos, r2.rl) == (b"q2", 31, 8)
    assert r2.cigar == [(0, 4), (2, 2), (0, 4)]
    # ref[31..34] + ref[37..40] with the 2-base deletion skipped
    assert r2.seq == REF[20:24] + REF[26:30]
    assert r2.end == 40
    assert r2.mate_tid == -1 and r2.tlen == 0


def test_rr_without_embedded_ref_flags_incomplete():
    raw = build_two_read_cram("external", embed_ref=False)
    recs = decode_records(raw)
    assert all(r.seq_incomplete for r in recs)
    # coverage-relevant fields still decode exactly
    assert recs[0].cigar == [(0, 10)]
    assert recs[1].cigar == [(0, 4), (2, 2), (0, 4)]
    # the record-emitting path fails loudly instead of writing N bases
    with pytest.raises(CramFormatError, match="embedded reference"):
        cram_to_bam_data(raw, require_seq=True)
    # the coverage path keeps working
    assert len(cram_to_bam_data(raw)) > 0


def test_rr0_gaps_do_not_flag_incomplete():
    raw = build_two_read_cram("external", embed_ref=False, rr=False)
    recs = decode_records(raw)
    assert recs[1].cigar == [(0, 4), (2, 2), (0, 4)]
    assert not recs[1].seq_incomplete
    # r1 carries an X feature, which is reference-based even under RR=0
    assert recs[0].seq_incomplete


def test_multi_slice_container():
    """Two slices inside ONE container (shared compression header)."""
    e1, e2 = Enc(), Enc()
    for e in (e1, e2):
        e.use_const("BF", 0)
        e.use_const("CF", 2)
        e.use_const("RL", 5)
        e.use_const("MF", 0)
        e.use_const("NS", -1)
        e.use_const("NP", 0)
        e.use_const("TS", 0)
        e.use_const("TL", 0)
        e.use_const("FN", 0)
        e.use_const("MQ", 13)
        e.use_const("RG", -1)
        e.use_ext("AP", 10)
        e.use_stop("RN", 40)
    e1.put("BF", 0); e1.put("CF", 2); e1.put("RL", 5); e1.put("AP", 7)
    e1.put_bytes("RN", b"s1r"); e1.put("MF", 0); e1.put("NS", -1)
    e1.put("NP", 0); e1.put("TS", 0); e1.put("TL", 0); e1.put("FN", 0)
    e1.put("MQ", 13)
    e2.put("BF", 0); e2.put("CF", 2); e2.put("RL", 5); e2.put("AP", 101)
    e2.put_bytes("RN", b"s2r"); e2.put("MF", 0); e2.put("NS", -1)
    e2.put("NP", 0); e2.put("TS", 0); e2.put("TL", 0); e2.put("FN", 0)
    e2.put("MQ", 13)
    comp = comp_header_bytes(e1.series, rr=False, sm=SM)
    b1 = e1.blocks()
    b2 = e2.blocks()
    sl1 = slice_hdr(0, 7, 5, 1, 0, len(b1), sorted(e1.ext.keys()))
    sl2 = slice_hdr(0, 101, 5, 1, 1, len(b2), sorted(e2.ext.keys()))
    cblocks = ([write_block(M_RAW, CT_COMP_HEADER, 0, comp),
                write_block(M_RAW, CT_SLICE_HEADER, 0, sl1)] + b1
               + [write_block(M_RAW, CT_SLICE_HEADER, 0, sl2)] + b2)
    cont = write_container(0, 7, 99, 2, 0, 10, cblocks)
    raw = (FILE_HEAD + sam_header_container("@SQ\tSN:cA\tLN:1000\n")
           + cont + CRAM_EOF)
    recs = decode_records(raw)
    assert [(r.name, r.pos, r.mapq) for r in recs] == [
        (b"s1r", 7, 13), (b"s2r", 101, 13)]


def test_v2_rejected_loudly():
    raw = CRAM_MAGIC + bytes([2, 1]) + b"x" * 20
    with pytest.raises(CramFormatError, match="major version 2"):
        list(iter_cram_containers(raw))


def test_missing_series_keyerror_becomes_format_error():
    """A compression header that omits a referenced data series (RL)
    must surface as CramFormatError, not a raw KeyError."""
    e = Enc()
    e.use_const("BF", 0)
    e.use_const("CF", 2)
    # RL deliberately missing
    e.use_ext("AP", 10)
    e.use_stop("RN", 40)
    e.put("BF", 0)
    comp = comp_header_bytes(e.series, rr=False, sm=SM)
    blocks = e.blocks()
    sl = slice_hdr(0, 1, 5, 1, 0, len(blocks), sorted(e.ext.keys()))
    cont = write_container(0, 1, 5, 1, 0, 5, [
        write_block(M_RAW, CT_COMP_HEADER, 0, comp),
        write_block(M_RAW, CT_SLICE_HEADER, 0, sl)] + blocks)
    raw = (FILE_HEAD + sam_header_container("@SQ\tSN:cA\tLN:1000\n")
           + cont + CRAM_EOF)
    with pytest.raises(CramFormatError):
        decode_records(raw)


def test_missing_stop_terminator_becomes_format_error():
    """BYTE_ARRAY_STOP with no terminator byte in the block must raise
    CramFormatError (bytes.index ValueError escape, ADVICE r3)."""
    e = Enc()
    e.use_const("BF", 0)
    e.use_const("CF", 2)
    e.use_const("RL", 5)
    e.use_const("MF", 0)
    e.use_const("NS", -1)
    e.use_const("NP", 0)
    e.use_const("TS", 0)
    e.use_const("TL", 0)
    e.use_const("FN", 0)
    e.use_const("MQ", 0)
    e.use_const("RG", -1)
    e.use_ext("AP", 10)
    e.use_stop("RN", 40)
    e.put("BF", 0); e.put("CF", 2); e.put("RL", 5); e.put("AP", 3)
    e._blob(40).extend(b"noterm")  # name WITHOUT the stop byte
    e.put("MF", 0); e.put("NS", -1); e.put("NP", 0); e.put("TS", 0)
    e.put("TL", 0); e.put("FN", 0); e.put("MQ", 0)
    comp = comp_header_bytes(e.series, rr=False, sm=SM)
    blocks = e.blocks()
    sl = slice_hdr(0, 3, 5, 1, 0, len(blocks), sorted(e.ext.keys()))
    cont = write_container(0, 3, 5, 1, 0, 5, [
        write_block(M_RAW, CT_COMP_HEADER, 0, comp),
        write_block(M_RAW, CT_SLICE_HEADER, 0, sl)] + blocks)
    raw = (FILE_HEAD + sam_header_container("@SQ\tSN:cA\tLN:1000\n")
           + cont + CRAM_EOF)
    with pytest.raises(CramFormatError):
        decode_records(raw)


def test_rg_tag_reconstructed_from_header():
    e = Enc()
    e.use_const("BF", 0)
    e.use_const("CF", 2)
    e.use_const("RL", 5)
    e.use_const("MF", 0)
    e.use_const("NS", -1)
    e.use_const("NP", 0)
    e.use_const("TS", 0)
    e.use_const("TL", 0)
    e.use_const("FN", 0)
    e.use_const("MQ", 0)
    e.use_ext("AP", 10)
    e.use_ext("RG", 11)
    e.use_stop("RN", 40)
    e.put("BF", 0); e.put("CF", 2); e.put("RL", 5); e.put("AP", 3)
    e._blob(11).extend(write_itf8(1))  # read group index 1
    e.put_bytes("RN", b"rgr"); e.put("MF", 0); e.put("NS", -1)
    e.put("NP", 0); e.put("TS", 0); e.put("TL", 0); e.put("FN", 0)
    e.put("MQ", 0)
    comp = comp_header_bytes(e.series, rr=False, sm=SM)
    blocks = e.blocks()
    sl = slice_hdr(0, 3, 5, 1, 0, len(blocks), sorted(e.ext.keys()))
    cont = write_container(0, 3, 5, 1, 0, 5, [
        write_block(M_RAW, CT_COMP_HEADER, 0, comp),
        write_block(M_RAW, CT_SLICE_HEADER, 0, sl)] + blocks)
    raw = (FILE_HEAD + sam_header_container(
        "@SQ\tSN:cA\tLN:1000\n@RG\tID:grpA\tSM:x\n@RG\tID:grpB\tSM:y\n")
        + cont + CRAM_EOF)
    bam = cram_to_bam_data(raw)
    assert b"RGZgrpB\x00" in bam  # index 1 -> second @RG ID


def test_nf_mates_same_position_tlen():
    """NF-linked mates at the SAME position: leftmost (first) record
    gets the positive TLEN (htslib tie rule: r.pos <= m.pos)."""
    e = Enc()
    e.use_const("BF", 0x43)   # paired, read1 (mate flags reconstructed)
    e.use_const("RL", 5)
    e.use_const("TL", 0)
    e.use_const("FN", 0)
    e.use_const("MQ", 7)
    e.use_const("RG", -1)
    e.use_ext("CF", 9)
    e.use_ext("AP", 10)
    e.use_ext("NF", 12)
    e.use_stop("RN", 40)
    # first record: CF mate-downstream, NF=0 -> partner is the next rec
    e.put("BF", 0x43); e._blob(9).extend(write_itf8(4)); e.put("RL", 5)
    e._blob(10).extend(write_itf8(50))
    e.put_bytes("RN", b"pair")
    e._blob(12).extend(write_itf8(0))
    e.put("TL", 0); e.put("FN", 0); e.put("MQ", 7)
    # second record: attached (CF=0), same position
    e.put("BF", 0x43); e._blob(9).extend(write_itf8(0)); e.put("RL", 5)
    e._blob(10).extend(write_itf8(50))
    e.put_bytes("RN", b"pair2")
    e.put("TL", 0); e.put("FN", 0); e.put("MQ", 7)
    comp = comp_header_bytes(e.series, rr=False, sm=SM)
    blocks = e.blocks()
    sl = slice_hdr(0, 50, 10, 2, 0, len(blocks), sorted(e.ext.keys()))
    cont = write_container(0, 50, 10, 2, 0, 10, [
        write_block(M_RAW, CT_COMP_HEADER, 0, comp),
        write_block(M_RAW, CT_SLICE_HEADER, 0, sl)] + blocks)
    raw = (FILE_HEAD + sam_header_container("@SQ\tSN:cA\tLN:1000\n")
           + cont + CRAM_EOF)
    r1, r2 = decode_records(raw)
    assert r2.name == r1.name == b"pair"  # NF partner inherits the name
    assert r1.mate_pos == r2.pos and r2.mate_pos == r1.pos
    assert r1.tlen == 5 and r2.tlen == -5  # span 50..54, leftmost positive
