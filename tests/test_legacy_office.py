"""Stdlib OLE2/CFB container + BIFF8 .xls + Word97 .doc extraction
(sources/ole2.py, sources/legacy_office.py) — the reference's
antiword/xlrd seams reimplemented from the public specs."""

from __future__ import annotations

import pytest

from pii_detector_spark.sources.legacy_office import (
    LegacyOfficeError,
    build_doc,
    build_xls,
    extract_doc_text,
    extract_xls_text,
)
from pii_detector_spark.sources.ole2 import Ole2Error, build_cfb, read_cfb


class TestCfbContainer:
    def test_roundtrip_mini_and_regular_streams(self):
        streams = {
            "WordDocument": b"A" * 10_000,  # regular FAT chain
            "1Table": b"tiny",  # ministream
            "\x05SummaryInformation": b"meta" * 10,
            "Empty": b"",
        }
        assert read_cfb(build_cfb(streams)) == streams

    def test_multisector_ministream_and_many_streams(self):
        many = {f"s{i:02d}": bytes([i + 1]) * (65 + i) for i in range(30)}
        assert read_cfb(build_cfb(many)) == many
        big_mini = {f"m{i}": b"x" * 3000 for i in range(5)}
        assert read_cfb(build_cfb(big_mini)) == big_mini

    def test_deterministic(self):
        s = {"a": b"1", "b": b"2" * 5000}
        assert build_cfb(s) == build_cfb(s)

    def test_rejects_non_cfb(self):
        with pytest.raises(Ole2Error):
            read_cfb(b"PK\x03\x04 this is a zip, not ole2" + b"\x00" * 600)


class TestXls:
    def test_multi_sheet_sst_numbers(self):
        xls = build_xls(
            [
                [["ssn", "172-32-1176"], [42, "inline text"]],
                [["second sheet", 3.5]],
            ]
        )
        assert (
            extract_xls_text(xls)
            == "ssn 172-32-1176\n42 inline text\nsecond sheet 3.5"
        )

    def test_unicode_strings_use_utf16_sst(self):
        xls = build_xls([[["héllo wörld", "кириллица"]]])
        assert extract_xls_text(xls) == "héllo wörld кириллица"

    def test_shared_strings_deduplicate(self):
        xls = build_xls([[["dup", "dup"], ["dup", "other"]]])
        assert extract_xls_text(xls) == "dup dup\ndup other"

    def test_missing_workbook_stream(self):
        with pytest.raises(LegacyOfficeError):
            extract_xls_text(build_cfb({"NotAWorkbook": b"x" * 100}))


class TestDoc:
    def test_multi_piece_mixed_encoding(self):
        text = "memo one\nwith ünïcode and кириллица\ntail"
        for pieces in (1, 2, 4):
            assert extract_doc_text(build_doc(text, pieces=pieces)) == text

    def test_control_chars_normalize(self):
        # \r (paragraph), \x0b (line break) → newline; field marks dropped
        doc = build_doc("a\nb", pieces=1)
        assert extract_doc_text(doc) == "a\nb"

    def test_encrypted_flag_rejected(self):
        import struct

        from pii_detector_spark.sources.ole2 import read_cfb as _read

        blob = build_doc("secret")
        streams = _read(blob)
        wd = bytearray(streams["WordDocument"])
        struct.pack_into("<H", wd, 0x000A, 0x0200 | 0x0100)  # fEncrypted
        enc = build_cfb({"WordDocument": bytes(wd), "1Table": streams["1Table"]})
        with pytest.raises(LegacyOfficeError):
            extract_doc_text(enc)

    def test_not_a_doc(self):
        with pytest.raises(LegacyOfficeError):
            extract_doc_text(build_cfb({"Workbook": b"x" * 2000}))
