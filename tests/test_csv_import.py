"""CSV-template import e2e (reference tests/test_csv.py:6-10 shape):
Windows dialect (';', ISO-8859-1) and Linux default dialect, template
render -> checkId -> filename clip/extend rule -> per-cluster .yml
files."""

from __future__ import annotations

import os
import tempfile

import yaml

from pygeodatacrawler_spark.sources.csv import read_csv_dialect
from pygeodatacrawler_spark.sources.csv_import import (
    import_csv_records,
    write_import_yml,
)

WIN_TEMPLATE = """mcf:
  version: 1.0
metadata:
    identifier: "{{ md['A'] }}"
identification:
    title: "{{ md['2B'] }}"
    abstract: "{{ md['C-c'] }}"
"""

LIN_TEMPLATE = """mcf:
  version: 1.0
metadata:
    identifier: "{{ md['a'] }}"
identification:
    title: "{{ md['b'] }}"
    abstract: "{{ md['c'] }}"
"""


def _write(path: str, text: str, encoding: str = "utf-8") -> str:
    with open(path, "w", encoding=encoding) as f:
        f.write(text)
    return path


def test_windows_dialect_accents_and_extend_rule(spark, tmp_path):
    csv_path = _write(
        str(tmp_path / "win.csv"),
        'A;2B;C-c;D d\n1;6-6-2024;Páblito;1@#$5\n2;za\n',
        encoding="ISO-8859-1",
    )
    rows = read_csv_dialect(spark, csv_path, sep=";", encoding="ISO-8859-1")
    recs = import_csv_records(rows, template=WIN_TEMPLATE)
    out = str(tmp_path / "out")
    write_import_yml(recs, out)
    # id '1' is <8 chars -> extended with '--' + folded abstract
    assert os.path.exists(os.path.join(out, "1--Pablito.yml"))
    with open(os.path.join(out, "1--Pablito.yml")) as f:
        d = yaml.safe_load(f)
    assert d["metadata"]["identifier"] == "1"
    assert d["identification"]["abstract"] == "Páblito"  # content keeps accents
    # short row padded: abstract '' -> letters None-ish -> still written
    names = set(os.listdir(out))
    assert any(n.startswith("2--") for n in names)


def test_linux_dialect_and_cluster_routing(spark, tmp_path):
    csv_path = _write(
        str(tmp_path / "lin.csv"),
        "a,b,c,d\n1,df,aw,56\n2,zz,yy,56\nabcdefgh,t,u,77\n",
    )
    rows = read_csv_dialect(spark, csv_path)
    recs = import_csv_records(rows, template=LIN_TEMPLATE, cluster_field="d")
    out = str(tmp_path / "out")
    write_import_yml(recs, out)
    assert os.path.exists(os.path.join(out, "56", "1--aw.yml"))
    assert os.path.exists(os.path.join(out, "56", "2--yy.yml"))
    # exactly 8 chars: neither clipped nor extended
    assert os.path.exists(os.path.join(out, "77", "abcdefgh.yml"))


def test_clip_missing_id_and_default_template(spark, tmp_path):
    csv_path = _write(
        str(tmp_path / "x.csv"),
        "id,title,abstract\n"
        + "A" * 40 + ",Long id row,ab\n"
        + ",No id row,some abstract text here\n",
    )
    rows = read_csv_dialect(spark, csv_path)
    recs = import_csv_records(rows)  # packaged default template shape
    got = {r["filename"]: r for r in recs.collect()}
    # >32 -> clipped to exactly 32 chars (+ extension)
    assert ("A" * 32 + ".yml") in got
    # missing id -> deterministic checkId fallback, then the <8/clip
    # rule applies to the derived id
    others = [n for n in got if not n.startswith("A" * 32)]
    assert len(others) == 1
    fn = others[0]
    assert fn.startswith("id-") and fn.endswith(".yml")
    assert got[fn]["identifier"].startswith("id-")
    # render is deterministic: same input -> same filenames
    again = {r["filename"] for r in import_csv_records(rows).collect()}
    assert again == set(got)