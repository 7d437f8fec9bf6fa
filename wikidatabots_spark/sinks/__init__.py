"""Sinks: RDF statement stdout emitter with row-cap guard."""

from wikidatabots_spark.sinks.rdf import print_rdf_statements

__all__ = ["print_rdf_statements"]
