"""CLI — same surface as the reference's ``dgraphpandas`` entry point.

Parity: /root/reference/dgraphpandas/__main__.py:17-84 (EP1/EP3):
``-x upserts|schema|types``, ``-f/-c/-ck/-o``, debug/console/export flags.

Differences (deliberate):
- Runs on a SparkSession (created here unless one is active), so the same
  command works under ``spark-submit --py-files dgraphpandas_spark.zip`` on a
  real cluster — ``upserts`` mode is fully distributed.
- Boolean flags parse ``True/False`` strings properly; the reference's
  ``value is not False`` filter made ``--add_dgraph_type_records False``
  un-overridable (reference __main__.py:63 — known wart, not copied).
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

from dgraphpandas_spark import __version__


def _bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ('1', 'true', 'yes', 'y')


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog='dgraphpandas_spark',
        description='PySpark-native tabular-to-RDF knowledge-graph pipeline',
    )
    parser.add_argument('-x', '--method', choices=['upserts', 'schema', 'types'], default='upserts')
    parser.add_argument('-f', '--file', required=False,
                        help='Data file (CSV or Parquet) to convert into RDF.')
    parser.add_argument('-c', '--config', required=True,
                        help='Pipeline configuration (same JSON schema as dgraphpandas).')
    parser.add_argument('-ck', '--config_file_key', required=False,
                        help='Entry in the configuration to use for the passed file.')
    parser.add_argument('-o', '--output_dir', default='.',
                        help='Output directory for exported files.')
    parser.add_argument('--console', action='store_true', default=False,
                        help='Show the transformed DataFrames (debug).')
    parser.add_argument('--export_csv', action='store_true', default=False,
                        help='Also write intrinsic/edges frames as CSV (debug).')
    parser.add_argument('--encoding', default=os.environ.get('DGRAPHPANDAS_ENCODING', 'utf-8'))
    parser.add_argument('--chunk_size', default=10_000_000, type=int,
                        help='Max records per output file (maps to maxRecordsPerFile).')
    parser.add_argument('--gz_compression_level', default=9, type=int,
                        help='gzip level for RDF export (mapped to the Hadoop zlib '
                             'CompressionLevel; honored when the native codec is loaded).')
    parser.add_argument('--reference_layout', action='store_true', default=False,
                        help='Rename RDF output part-files into the reference\'s '
                             'chunk-indexed single-file names (<src>_intrinsic.gz, _2.gz, ...).')
    parser.add_argument('--key_separator')
    parser.add_argument('--add_dgraph_type_records', default=True, type=_bool)
    parser.add_argument('--drop_na_intrinsic_objects', default=True, type=_bool)
    parser.add_argument('--drop_na_edge_objects', default=True, type=_bool)
    parser.add_argument('--illegal_characters', nargs='*', default=None)
    parser.add_argument('--illegal_characters_intrinsic_object', nargs='*', default=None)
    parser.add_argument('--master', default=os.environ.get('SPARK_MASTER', 'local[*]'),
                        help='Spark master when no active session exists (ignored under spark-submit).')
    parser.add_argument('--version', action='version', version=__version__)
    parser.add_argument('-v', '--verbosity',
                        choices=['DEBUG', 'INFO', 'WARNING', 'ERROR', 'NOTSET'],
                        default=os.environ.get('DGRAPHPANDAS_LOG', 'INFO'))
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(level=args.verbosity)

    options = {
        'key_separator': args.key_separator,
        'add_dgraph_type_records': args.add_dgraph_type_records,
        'drop_na_intrinsic_objects': args.drop_na_intrinsic_objects,
        'drop_na_edge_objects': args.drop_na_edge_objects,
        'illegal_characters': args.illegal_characters,
        'illegal_characters_intrinsic_object': args.illegal_characters_intrinsic_object,
        'console': args.console,
        'export_csv': args.export_csv,
        'chunk_size': args.chunk_size,
        'encoding': args.encoding,
        'gz_compression_level': args.gz_compression_level,
        'reference_layout': args.reference_layout,
    }
    options = {k: v for k, v in options.items() if v is not None}

    if args.method == 'upserts':
        if args.file is None:
            raise ValueError('file must be provided in upsert mode')
        if args.config_file_key is None:
            raise ValueError('config_file_key must be provided in upsert mode')
        from pyspark.sql import SparkSession

        from dgraphpandas_spark.plans.pipeline import to_rdf
        from dgraphpandas_spark.session import get_spark

        if SparkSession.getActiveSession() is None:
            get_spark(app_name='dgraphpandas-spark-cli', master=args.master)
        # Writes happen inside to_rdf; line counts are logged there via
        # Observation on the write action — no post-hoc .count() re-execution.
        to_rdf(
            args.file, args.config, args.config_file_key, args.output_dir,
            export_rdf=True, **options,
        )
    elif args.method == 'schema':
        from dgraphpandas_spark.writers.schema import create_schema, generate_schema

        rows = create_schema(args.config, ensure_xid_predicate=True, **options)
        generate_schema(rows, export_schema=True, output_dir=args.output_dir, **options)
    elif args.method == 'types':
        from dgraphpandas_spark.writers.schema import create_schema, generate_types

        rows = create_schema(args.config, ensure_xid_predicate=True, **options)
        generate_types(rows, export_schema=True, output_dir=args.output_dir, **options)


if __name__ == '__main__':
    main()
