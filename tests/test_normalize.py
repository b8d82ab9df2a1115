"""Decision-table tests for normalization — ported from the reference semantics
(smart_merger.py normalize_* + similarity.py name helpers)."""

import pyarrow as pa
import pytest

from bibexpy_ray.functions import normalize as N


def test_normalize_doi():
    assert N.normalize_doi("https://doi.org/10.1234/ABC") == "10.1234/abc"
    assert N.normalize_doi("http://dx.doi.org/10.x") == "10.x"
    assert N.normalize_doi("10.1234/abc/") == "10.1234/abc"
    assert N.normalize_doi("not-a-doi") is None
    assert N.normalize_doi("") is None
    assert N.normalize_doi(None) is None
    assert N.normalize_doi("10.1/a.") == "10.1/a"


def test_normalize_text_stopwords_and_unicode():
    assert N.normalize_text("The Quick BROWN fox!") == "quick brown fox"
    assert N.normalize_text("Éxposé naïve") == "expose naive"
    assert N.normalize_text("a of in on and") == ""
    assert N.normalize_text("") == ""
    assert N.normalize_text(None) == ""
    assert N.normalize_text("x  \t y") == "x y"


def test_normalize_text_latex():
    assert "emph" not in N.normalize_text(r"\emph{Bold} title")


def test_normalize_year():
    assert N.normalize_year("2023.0") == 2023
    assert N.normalize_year(2023) == 2023
    assert N.normalize_year("1899") is None
    assert N.normalize_year("2101") is None
    assert N.normalize_year("abc") is None
    assert N.normalize_year("") is None


def test_name_initials():
    assert N.name_initials("Smith, John A") == ("smith", "ja")
    assert N.name_initials("Smith J A") == ("smith", "ja")
    assert N.name_initials("van der Berg, J") == ("van der berg", "j")
    assert N.name_initials("") == ("", "")


def test_normalize_author_surname():
    assert N.normalize_author_surname("Smith J;Lee K") == "SMITH"
    assert N.normalize_author_surname("Smith, John A.;Lee, Kim") == "SMITH"
    assert N.normalize_author_surname("") == ""


def test_normalize_issn():
    assert N.normalize_issn("1234-567X") == "1234567X"
    assert N.normalize_issn("1234567") is None
    assert N.normalize_issn(None) is None


def test_normalize_id_token():
    assert N.normalize_id_token(" ABC ") == "abc"
    assert N.normalize_id_token("") is None


@pytest.mark.parametrize(
    "s",
    [
        "The  Quick,   brown FOX!",
        "a of in on",
        "",
        "Éxposé — l'être of naïve café",
        "xxx",
        r"LaTeX \emph{bold} and $math$",
        "been there done that 123",
        "UPPER lower MiXeD 42 a1b the1 1the",
        "word; word| word",
    ],
)
def test_batch_matches_scalar(s):
    batch = N.normalize_text_batch(pa.array([s]))
    assert batch.to_pylist()[0] == N.normalize_text(s)


def test_batch_matches_scalar_fuzz():
    import random
    import string

    random.seed(7)
    alphabet = string.ascii_letters + string.digits + " .,;:!?-_()[]{}'\"éüñßØ\\$&#"
    samples = [
        "".join(random.choice(alphabet) for _ in range(random.randrange(0, 60)))
        for _ in range(300)
    ]
    out = N.normalize_text_batch(pa.array(samples)).to_pylist()
    for s, got in zip(samples, out):
        assert got == N.normalize_text(s), repr(s)


def test_sr_tag():
    # reference MergeDB.py:27-42 semantics
    assert N.sr_tag("Smith, J; Doe, A", "2020") == "Smith, J 2020"
    assert N.sr_tag(None, "2020") == "2020"
    assert N.sr_tag("Smith, J", None) == "Smith, J"
    assert N.sr_tag(float("nan"), float("nan")) == ""
    assert N.sr_tag("  Lee, K ;X", 1999) == "Lee, K 1999"


def test_clean_author_fullnames():
    # reference MergeDB.py:665-699 example
    assert N.clean_author_fullnames("CAO, NANNAN (58490132900)") == "CAO, NANNAN"
    assert (
        N.clean_author_fullnames("A, B (1); C,  D (2); (3)")
        == "A, B; C, D"
    )
    assert N.clean_author_fullnames(None) == ""
    assert N.clean_author_fullnames("  Plain Name  ") == "Plain Name"
