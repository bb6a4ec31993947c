from kafka_streams_aggregate_spark.functions.money import (
    dec,
    money_avg_sql,
    money_sum,
    money_sum_sql,
)

__all__ = ["dec", "money_sum", "money_sum_sql", "money_avg_sql"]
