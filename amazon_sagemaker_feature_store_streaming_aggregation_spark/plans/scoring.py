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
    min_instances_per_node: int = 6,
    seed: int = 42,
) -> GBTClassificationModel:
    """T5: gradient-boosted binary classifier.

    Hyper-param mapping vs the reference XGBoost
    (``3_train_and_deploy_model.ipynb:180-214``), stated exactly:
    ``max_depth=5`` → ``maxDepth``, ``eta=0.2`` → ``stepSize``,
    ``subsample=0.7`` → ``subsamplingRate``, ``min_child_weight=6`` →
    ``minInstancesPerNode=6`` (the closest MLlib analog — instance
    count, not hessian weight). ``num_round=100`` is deliberately NOT
    defaulted: 100 GBT iterations cost 5× the training time for no
    benefit at the test scale; pass ``max_iter=100`` for the
    reference's full schedule. ``gamma=4`` has NO MLlib equivalent
    (``minInfoGain`` is an information-gain floor on a different
    scale) and is left unmapped. Behavioral — not bit-exact — parity,
    as the module docstring says.
    """
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
        minInstancesPerNode=min_instances_per_node,
        seed=seed,
    )
    return gbt.fit(assembled)


def score(
    df: DataFrame,
    model: GBTClassificationModel,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
) -> DataFrame:
    """I8: in-plan scoring; adds a ``probability`` (P[fraud]) column.

    Null/NaN-feature rows are routed EXPLICITLY: ``handleInvalid=
    'keep'`` stops a poison row from killing a long-running job (the
    alternative, ``'error'``, is what training uses — a dirty training
    set should fail loudly), but a kept NaN silently routes the same
    direction at every tree split and the model would emit a
    confident, meaningless probability. Such rows get ``probability
    NULL`` instead; ``threshold_classify`` then yields a NULL
    prediction, so an unscored transaction is visibly unscored rather
    than silently cleared.
    """
    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="keep"
    ).transform(df)
    scored = model.transform(assembled)
    prob_vec = model.getProbabilityCol()  # also named "probability"
    valid = F.lit(True)
    for c in feature_cols:
        d = F.col(c).cast("double")
        valid = valid & d.isNotNull() & ~F.isnan(d)
    return (
        scored.withColumn(
            "__p_fraud",
            F.when(valid, vector_to_array(F.col(prob_vec))[1]),
        )
        .drop("features", "rawPrediction", prob_vec, "prediction")
        .withColumnRenamed("__p_fraud", "probability")
    )
