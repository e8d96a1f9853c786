"""Graph JSON schema compatibility with the reference toolchain.

pypangraph validates {"pangraph": <graph>} against the generated
Pangraph.schema.json (class_graph.py:77-79); if our JSON passes, the entire
reference Python analysis ecosystem loads our graphs unchanged."""
import json
import pathlib

import jsonschema
import pytest

REFERENCE_SCHEMA = pathlib.Path("/root/reference/packages/pangraph-schemas/Pangraph.schema.json")


@pytest.fixture(scope="module")
def ref_schema():
    if not REFERENCE_SCHEMA.exists():
        pytest.skip("reference schema not available")
    return json.loads(REFERENCE_SCHEMA.read_text())


def _validate(doc, schema):
    errs = list(jsonschema.Draft202012Validator(schema).iter_errors({"pangraph": doc}))
    assert not errs, errs[:3]


def test_built_graph_validates_against_reference_schema(ref_schema, tmp_path):
    from pangraph_tpu.align.params import BuildArgs
    from pangraph_tpu.build.build import build
    from pangraph_tpu.io.fasta import read_fasta

    recs = read_fasta("/root/reference/data/russian_doll_plasmids.fa.gz")
    graph = build(recs, BuildArgs(circular=True))
    _validate(json.loads(graph.to_json()), ref_schema)


def test_roundtripped_fixture_validates(ref_schema):
    from pangraph_tpu.graph.graph import Pangraph

    g = Pangraph.from_file("/root/reference/data/test_graph.json")
    _validate(json.loads(g.to_json()), ref_schema)


def test_our_schema_command_accepts_our_graphs():
    from pangraph_tpu.commands import export_schema
    from pangraph_tpu.graph.graph import Pangraph

    schema = json.loads(export_schema(None))
    g = Pangraph.from_file("/root/reference/data/test_graph.json")
    jsonschema.validate(json.loads(g.to_json()), schema)
