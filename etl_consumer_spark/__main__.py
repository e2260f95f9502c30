"""``python -m etl_consumer_spark`` — run the consumer (see runner.py)."""

from etl_consumer_spark.runner import main

main()
