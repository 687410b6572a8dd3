"""MLlib price-regression pipeline (SURVEY.md §2.10 capability map).

The reference trains two Keras FCFF regressors over the 15-feature
``air_b`` table (M1/M2, extracted from the SavedModel protobufs).
MLlib has no DNN regressor; per SURVEY.md §2.10 the capability mapping
is a ``Pipeline`` of assembler → scaler → {LinearRegression,
GBTRegressor} with ``RegressionEvaluator`` on MAE — same contract
(tabular features in, price out, MAE-scored), Spark-native execution.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import (
    Binarizer,
    MinMaxScaler,
    Normalizer,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.regression import GBTRegressor, LinearRegression

from pyspark.sql import DataFrame

SEED = 42

FEATURE_COLS = [
    "property_type",
    "room_type",
    "accommodates",
    "bathrooms",
    "bed_type",
    "cancellation_policy",
    "cleaning_fee",
    "city",
    "host_identity_verified",
    "host_since",
    "instant_bookable",
    "review_scores_rating",
    "zipcode",
    "bedrooms",
    "beds",
]
LABEL_COL = "price"


def build_pipeline(
    model: str = "gbt", scaler: str = "standard", **params
) -> Pipeline:
    """assembler → scaler → regressor, all MLlib stages.

    ``scaler`` selects the feature-transform stage, covering the
    reference's full E3 import surface (EDA Notebook.ipynb cell 2:
    ``StandardScaler, Normalizer, Binarizer, OrdinalEncoder``):
    ``standard`` (z-score), ``normalizer`` (row L2), ``binarizer``
    (elementwise > 0 indicator), ``minmax`` (range scale) or ``none``.
    The OrdinalEncoder equivalent is :func:`ordinal_indexer` — a
    column transform, so a pre-assembler stage rather than a scaler.
    """
    out = "features_raw" if scaler != "none" else "features"
    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol=out, handleInvalid="skip"
    )
    if scaler == "standard":
        xform = [
            StandardScaler(
                inputCol="features_raw",
                outputCol="features",
                withMean=True,
                withStd=True,
            )
        ]
    elif scaler == "normalizer":
        xform = [Normalizer(inputCol="features_raw", outputCol="features", p=2.0)]
    elif scaler == "binarizer":
        xform = [
            Binarizer(threshold=0.0, inputCol="features_raw", outputCol="features")
        ]
    elif scaler == "minmax":
        xform = [MinMaxScaler(inputCol="features_raw", outputCol="features")]
    elif scaler == "none":
        xform = []
    else:
        raise ValueError(f"unknown scaler {scaler!r}")
    if model == "gbt":
        reg = GBTRegressor(
            featuresCol="features",
            labelCol=LABEL_COL,
            seed=SEED,
            maxDepth=params.get("maxDepth", 5),
            maxIter=params.get("maxIter", 20),
            stepSize=params.get("stepSize", 0.1),
        )
    elif model == "linear":
        reg = LinearRegression(
            featuresCol="features",
            labelCol=LABEL_COL,
            regParam=params.get("regParam", 0.0),
            elasticNetParam=params.get("elasticNetParam", 0.0),
        )
    else:
        raise ValueError(f"unknown model {model!r}")
    return Pipeline(stages=[assembler, *xform, reg])


def ordinal_indexer(cols: list[str]) -> list[StringIndexer]:
    """sklearn ``OrdinalEncoder`` equivalent: one ``StringIndexer``
    per column with alphabetical category order (sklearn sorts
    categories lexicographically; MLlib's default is frequency order,
    which would scramble codes) — the same contract as the E1 label
    encoding, packaged as pipeline stages."""
    return [
        StringIndexer(
            inputCol=c,
            outputCol=f"{c}_ord",
            stringOrderType="alphabetAsc",
            handleInvalid="keep",
        )
        for c in cols
    ]


@dataclass
class TrainResult:
    model: PipelineModel
    mae: float
    rmse: float
    r2: float


def train_and_evaluate(
    train: DataFrame, test: DataFrame, model: str = "gbt", **params
) -> TrainResult:
    fitted = build_pipeline(model, **params).fit(train)
    preds = fitted.transform(test)
    evaluator = RegressionEvaluator(labelCol=LABEL_COL, predictionCol="prediction")
    return TrainResult(
        model=fitted,
        mae=evaluator.setMetricName("mae").evaluate(preds),
        rmse=evaluator.setMetricName("rmse").evaluate(preds),
        r2=evaluator.setMetricName("r2").evaluate(preds),
    )
