"""Locality-aware assembly (`assemble_documents(locality='auto')`):
block-local assembly + boundary-only shuffle must equal the full
hash-shuffle path on any input layout."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from jerex_ray.sources.transcripts import generate_transcripts_table
from jerex_ray.stages.assemble import assemble_documents


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in ("turn_idx", "role", "text", "tool", "ts"):
        df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "part_key", "turn_idx", "role", "text"]]


@pytest.fixture(scope="module")
def table():
    return generate_transcripts_table(120)


@pytest.fixture(scope="module")
def shuffled_docs(table):
    return _norm(assemble_documents(
        rd.from_arrow(table), num_partitions=4,
        shuffle_blocks=4).to_pandas())


def test_contiguous_layout_matches_shuffle_path(table, shuffled_docs):
    got = _norm(assemble_documents(
        rd.from_arrow(table), num_partitions=4,
        locality="auto").to_pandas())
    pd.testing.assert_frame_equal(got, shuffled_docs)


def test_interleaved_layout_routes_through_boundary_shuffle(
        table, shuffled_docs):
    # worst case: rows shuffled so every conv spans many blocks — the
    # cross set covers everything and the repair shuffle does the work
    df = table.to_pandas().sample(frac=1.0, random_state=0) \
        .reset_index(drop=True)
    got = _norm(assemble_documents(
        rd.from_pandas(df).repartition(8), num_partitions=4,
        locality="auto").to_pandas())
    pd.testing.assert_frame_equal(got, shuffled_docs)


def test_split_conv_on_block_boundary(table, shuffled_docs):
    # contiguous layout but block boundaries cut convs mid-way: with
    # 7 partitions of row-ordered data, boundary convs span two blocks
    got = _norm(assemble_documents(
        rd.from_pandas(table.to_pandas()).repartition(7),
        num_partitions=4, locality="auto").to_pandas())
    pd.testing.assert_frame_equal(got, shuffled_docs)


def test_fallback_when_cross_set_exceeds_bound(table, shuffled_docs):
    df = table.to_pandas().sample(frac=1.0, random_state=1) \
        .reset_index(drop=True)
    got = _norm(assemble_documents(
        rd.from_pandas(df).repartition(8), num_partitions=4,
        shuffle_blocks=4, locality="auto",
        max_cross_broadcast=5).to_pandas())
    pd.testing.assert_frame_equal(got, shuffled_docs)


def test_incomplete_conv_raises_not_silent(table):
    # a conv missing turn 0 violates the transcript data model the
    # local completeness guard protects (it is what catches traversal
    # drift) — must raise, never emit a partial document
    df = table.to_pandas()
    victim = df["conv_id"].iloc[0]
    df = df[~((df["conv_id"] == victim) & (df["turn_idx"] == 0))]
    with pytest.raises(Exception, match="incomplete local conv"):
        assemble_documents(rd.from_pandas(df.reset_index(drop=True)),
                           num_partitions=4,
                           locality="auto").materialize()
