#!/usr/bin/env python
"""spark-submit launcher for the dgraphpandas_spark CLI.

Use THIS script (repo root) with spark-submit, not
``dgraphpandas_spark/__main__.py`` directly: spark-submit prepends the
script's own directory to sys.path, and launching from inside the package
would shadow stdlib modules (e.g. our ``types.py`` over stdlib ``types``).

    spark-submit --master <master> --py-files dgraphpandas_spark.zip \
        run_cli.py -x upserts -f data.parquet -c config.json -ck key -o out/
"""
from dgraphpandas_spark.__main__ import main

if __name__ == '__main__':
    main()
