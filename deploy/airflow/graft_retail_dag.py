"""Daily weekly-fact build for the graft retail pipeline.

The engine's executable analog of the reference scheduler chain
(Lambda -> Airflow DAG -> EMR step sensor -> SES alerting; reference:
`Airflow Dag.py:10-81`, `Lambda Function.py`): the Lambda's S3-listing
job is replaced by the readiness sensor below (and by the app's own
exit-2 readiness gate, which makes even a sensor-less retry loop safe),
the EMR step + step sensor collapse into one SparkSubmitOperator whose
exit code IS the signal, and SES email is replaced by the app's
`--alert-webhook` transport (RUNBOOK.md maps it onto mail gateways).

Exit-code contract (RUNBOOK.md):
  0 = fact written (idempotent per-date dynamic overwrite — reruns are
      always safe);
  1 = bad arguments (a DAG bug: fails fast, never retried into place —
      PipelineSpec validates this file's args against the CLI parser);
  2 = inputs not ready (the retry ladder below covers the late-drop
      case the sensor's timeout lets through).
"""

from __future__ import annotations

import os

import pendulum
from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)
from airflow.sensors.python import PythonSensor

# File-name contract shared with the app's readiness gate:
# {table}_YYYYMMDD.csv under the landing dir, for the five inputs.
LANDING = "/data/landing/retail/"
TABLES = ("calendar", "inventory", "product", "sales", "store")


def inputs_ready(ds: str) -> bool:
    """Spark-free poke of the landing listing. For an object store,
    swap the os.path probe for S3Hook.check_for_key — the app re-checks
    either way and exits 2 if a file vanished between poke and run."""
    compact = ds.replace("-", "")
    return all(
        os.path.exists(os.path.join(LANDING, f"{t}_{compact}.csv"))
        for t in TABLES
    )


with DAG(
    dag_id="graft_retail_weekly_fact",
    # after the upstream drop window; an off-:00 minute avoids the
    # top-of-hour thundering herd on shared infrastructure
    schedule="17 2 * * *",
    start_date=pendulum.datetime(2024, 1, 1, tz="UTC"),
    catchup=False,
    dagrun_timeout=pendulum.duration(hours=2),
    default_args={
        "owner": "data-eng",
        "depends_on_past": False,
        # exit 2 (not ready) and transient cluster failures retry on
        # the same ladder: idempotent overwrite makes repeats safe
        "retries": 6,
        "retry_delay": pendulum.duration(minutes=30),
    },
) as dag:
    wait = PythonSensor(
        task_id="inputs_ready",
        python_callable=inputs_ready,
        op_kwargs={"ds": "{{ ds }}"},
        poke_interval=300,
        timeout=6 * 3600,
        mode="reschedule",
    )

    # PipelineSpec extracts application_args from this literal block and
    # runs them through the CLI parser — keep the args as plain string
    # literals so the contract check can see them.
    build = SparkSubmitOperator(
        task_id="weekly_fact",
        application="/opt/graft/graft.jar",
        java_class="graft.app.RetailEtlApp",
        application_args=[
            "--date", "{{ ds }}",
            "--in-dir", "/data/landing/retail/",
            "--out", "/data/warehouse/weekly_fact/",
            "--mode", "faithful",
            "--alert-webhook", "https://hooks.example.com/etl",
        ],
        conf={"spark.sql.session.timeZone": "UTC"},
    )

    wait >> build
