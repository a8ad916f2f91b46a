"""Operator inventory modules. Importing them populates the registry."""

from __future__ import annotations


def load_all() -> None:
    from hive_gateway_spark.operators import (  # noqa: F401
        relational,
        windows,
        gateway,
        text,
        dedup,
        similarity,
        multimodal,
        advanced,
        scalar_funcs,
        sampling,
        corpus,
        bpe,
        ranking,
        tpcds,
    )
