"""Model training + scoring (reference T5 / I8).

Reference trains XGBoost ``binary:logistic`` (``3_train_and_deploy_
model.ipynb:180-214``) and scores per event over HTTP (``lambda_
function.py:280-294``). The public-Spark equivalent is MLlib's
``GBTClassifier`` (gradient-boosted trees, behavioral — not bit-exact —
parity) scoring in-plan via ``model.transform`` — no endpoint, no
per-event RPC; the model broadcast rides the executor closure.
"""

from __future__ import annotations

from pyspark.ml.classification import GBTClassifier, GBTClassificationModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COLS = ("amount", "amt_ratio1", "amt_ratio2", "count_ratio")


def train_fraud_model(
    train_df: DataFrame,
    label_col: str = "fraud_label",
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    max_depth: int = 5,
    max_iter: int = 20,
    step_size: float = 0.2,
    subsample: float = 0.7,
    seed: int = 42,
) -> GBTClassificationModel:
    """T5: gradient-boosted binary classifier (reference hyper-params
    ``max_depth=5, eta=0.2, subsample=0.7`` mapped to MLlib)."""
    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features"
    ).transform(train_df)
    gbt = GBTClassifier(
        labelCol=label_col,
        featuresCol="features",
        maxDepth=max_depth,
        maxIter=max_iter,
        stepSize=step_size,
        subsamplingRate=subsample,
        seed=seed,
    )
    return gbt.fit(assembled)


def score(
    df: DataFrame,
    model: GBTClassificationModel,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
) -> DataFrame:
    """I8: in-plan scoring; adds a ``probability`` (P[fraud]) column."""
    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="keep"
    ).transform(df)
    scored = model.transform(assembled)
    prob_vec = model.getProbabilityCol()  # also named "probability"
    return (
        scored.withColumn("__p_fraud", vector_to_array(F.col(prob_vec))[1])
        .drop("features", "rawPrediction", prob_vec, "prediction")
        .withColumnRenamed("__p_fraud", "probability")
    )
