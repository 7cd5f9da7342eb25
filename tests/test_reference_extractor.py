"""Frozen reference extractor unit tests (edge-case corpus, FIXTURES.md §3)."""

import json

import pytest

from clawrag_ray.reference.extractor import (
    ExtractError,
    Span,
    extract_document,
    extract_pdf_page,
    parse_pdf_payload,
    route_document,
)
from clawrag_ray.reference.scoring import (
    classify_extension,
    extract_amounts,
    extract_clauses,
    ocr_penalty,
    quality_score,
    structure_score,
)


class TestMarkdown:
    @pytest.mark.parametrize(
        "payload,expect_text",
        [
            ("## \n### \n", "## ###"),
            ("- \n- \n- ", "- - -"),
        ],
    )
    def test_issue6_degenerate_fallback(self, payload, expect_text):
        spans = extract_document("markdown", payload)
        assert spans == [Span("text", expect_text, "", 0)]

    def test_issue6_title_empty_lists(self):
        assert extract_document("markdown", "# Title\n- \n- ") == [Span("heading", "Title", "", 0)]

    def test_normal_markdown(self):
        spans = extract_document("markdown", "# Hello\n\nThis is content.")
        assert [(s.kind, s.text) for s in spans] == [("heading", "Hello"), ("text", "This is content.")]

    def test_figure_media_ref(self):
        spans = extract_document("markdown", "![a cat](media://doc-1/1)")
        assert spans == [Span("figure", "a cat", "media://doc-1/1", 0)]

    def test_interleaving_order(self):
        md = "# T\n\npara one\n\n![f](media://d/1)\n\n- a\n- b\n\n| x | y |\n\n```\ncode here\n```"
        kinds = [s.kind for s in extract_document("markdown", md)]
        assert kinds == ["heading", "text", "figure", "list", "table", "code"]

    def test_long_text_chunked_in_order(self):
        body = "sentence here. " * 200  # 3000 chars
        spans = extract_document("markdown", f"# H\n\n{body}")
        texts = [s for s in spans if s.kind == "text"]
        assert len(texts) > 1
        offs = [s.offset for s in spans]
        assert offs == sorted(offs)
        # chunk offsets are consecutive within the block
        assert [s.offset for s in texts] == list(range(texts[0].offset, texts[0].offset + len(texts)))


class TestHtml:
    def test_boilerplate_stripped(self):
        html = (
            "<html><body><nav><a href='/x'>Home</a></nav>"
            "<p>Real content paragraph here.</p>"
            "<footer><p>copyright links</p></footer></body></html>"
        )
        spans = extract_document("html", html)
        assert [(s.kind, s.text) for s in spans] == [("text", "Real content paragraph here.")]

    def test_link_density_drop(self):
        html = "<p><a href='/a'>one two three four</a> x</p><p>normal text without links at all</p>"
        texts = [s.text for s in extract_document("html", html)]
        assert texts == ["normal text without links at all"]

    def test_structure(self):
        html = (
            "<h1>Title</h1><p>Body text.</p><ul><li>i1</li><li>i2</li></ul>"
            "<table><tr><td>a</td><td>b</td></tr></table>"
            '<img src="media://d/1" alt="fig">'
        )
        spans = extract_document("html", html)
        assert [s.kind for s in spans] == ["heading", "text", "list", "table", "figure"]
        assert spans[2].text == "i1\ni2"
        assert spans[3].text == "| a | b |"
        assert spans[4].media_ref == "media://d/1"

    def test_tagless_fallback(self):
        spans = extract_document("html", "just raw text no tags")
        assert spans == [Span("text", "just raw text no tags", "", 0)]


class TestPdfLike:
    def _payload(self, pages, encrypted=False):
        return json.dumps({"pages": pages, "encrypted": encrypted})

    def test_reading_order_restored(self):
        # blocks stored out of order; y-band then x ordering restores them
        page = {
            "blocks": [
                {"x": 5, "y": 100, "kind": "text", "text": "third"},
                {"x": 5, "y": 10, "kind": "heading", "text": "first"},
                {"x": 80, "y": 11, "kind": "text", "text": "second"},
            ]
        }
        spans = extract_document("pdf_like", self._payload([page]))
        assert [s.text for s in spans] == ["first", "second", "third"]

    def test_encrypted_raises(self):
        with pytest.raises(ExtractError) as ei:
            extract_document("pdf_like", self._payload([], encrypted=True))
        assert ei.value.code == "ENCRYPTED_PDF"
        assert route_document("pdf_like", self._payload([], encrypted=True)) == "error"

    def test_invalid_json_raises(self):
        with pytest.raises(ExtractError):
            extract_document("pdf_like", "not json")

    def test_scan_routes_heavy_and_ocr_extracted(self):
        page = {"blocks": [{"x": 0, "y": 0, "kind": "ocr", "text": "scanned words here"}]}
        payload = self._payload([page])
        assert route_document("pdf_like", payload) == "heavy"
        spans = extract_document("pdf_like", payload)
        assert spans == [Span("text", "scanned words here", "", 0)]

    def test_digital_routes_fast_and_ignores_ocr(self):
        page = {
            "blocks": [
                {"x": 0, "y": 0, "kind": "text", "text": "d" * 60},
                {"x": 0, "y": 30, "kind": "ocr", "text": "noise"},
            ]
        }
        payload = self._payload([page])
        assert route_document("pdf_like", payload) == "fast"
        assert [s.text for s in extract_document("pdf_like", payload)] == ["d" * 60]

    def test_page_offsets_disjoint_and_ordered(self):
        pages = [{"blocks": [{"x": 0, "y": 0, "kind": "text", "text": f"page {i} text " * 10}]} for i in range(5)]
        spans = extract_document("pdf_like", self._payload(pages))
        offs = [s.offset for s in spans]
        assert offs == sorted(offs)
        assert {s.offset // 1_000_000 for s in spans} == {0, 1, 2, 3, 4}

    def test_per_page_equals_whole_doc(self):
        # the distributed unit of work must reproduce the single-threaded result
        pages = [
            {"blocks": [{"x": 3, "y": 50, "kind": "text", "text": "b"}, {"x": 1, "y": 1, "kind": "text", "text": "a" * 80}]}
            for _ in range(4)
        ]
        payload = self._payload(pages)
        whole = extract_document("pdf_like", payload)
        doc = parse_pdf_payload(payload)
        per_page = [s for i, p in enumerate(doc["pages"]) for s in extract_pdf_page(p, i, heavy=False)]
        assert whole == per_page


class TestEmailAndText:
    def test_email(self):
        eml = "From: a@x.com\nTo: b@x.com\nSubject: Hi there\n\nBody para.\n\nSecond para.\n"
        spans = extract_document("email", eml)
        assert spans[0] == Span("heading", "Hi there", "", 0)
        assert spans[1].text == "From: a@x.com | To: b@x.com"
        assert [s.text for s in spans[2:]] == ["Body para.", "Second para."]

    def test_text_paragraphs(self):
        spans = extract_document("text", "one\n\ntwo\n\n\nthree")
        assert [s.text for s in spans] == ["one", "two", "three"]
        assert [s.offset for s in spans] == [0, 1000, 2000]

    def test_unknown_kind(self):
        with pytest.raises(ExtractError):
            extract_document("docx", "x")


class TestScoring:
    def test_structure_score(self):
        assert structure_score(0, 0, 0, 0) == 0.1
        assert structure_score(1, 1, 1, 1) == pytest.approx(1.0)
        assert structure_score(1, 0, 0, 0) == pytest.approx(0.4)
        assert structure_score(5, 6, 0, 0) == pytest.approx(min(1.0, 0.7 * 1.2))

    def test_quality_score_bounds(self):
        assert quality_score(19, True) == 0.0
        q = quality_score(5000, True, ocr_confidence=1.0, structure=1.0)
        assert q == 1.0
        assert 0.0 <= quality_score(100, False) <= 1.0

    def test_quality_default_components(self):
        # 5000 chars, known lang, default ocr 0.5, default structure 0.2
        assert quality_score(5000, True) == pytest.approx(0.10 + 0.20 + 0.15 + 0.08)

    def test_ocr_penalty(self):
        assert ocr_penalty("clean text") == 0.0
        assert ocr_penalty("bad � char") == pytest.approx(0.1)
        assert ocr_penalty("l i k e t h i s") == pytest.approx(0.1)
        many_short = "\n".join(["ok long line here"] * 5 + ["x"] * 2)
        assert ocr_penalty(many_short) == pytest.approx(0.1)

    def test_classify_extension(self):
        assert classify_extension(".py") == ("source_code", 0.95)
        assert classify_extension(".csv") == ("spreadsheets", 0.9)
        assert classify_extension(".weird") == ("generic", 0.3)

    def test_clause_amount_regex(self):
        text = "This is a Section 1 contract. Clause 5 applies. Pay 1,234.56 EUR or 999 $."
        assert extract_clauses(text) == ["Section 1", "Clause 5"]
        assert extract_amounts(text) == ["1,234.56 EUR", "999 $"]
