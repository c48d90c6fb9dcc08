from vmg_tpu.configs.config import (
    VMGNetworkConfig,
    DatasetConfig,
    TrainConfig,
    EvalConfig,
    LoggerConfig,
    PathConfig,
    ExperimentConfig,
    load_config,
    FEW_LEVELS_PRESET,
    FULL_PRESET,
    TINY_TEST_PRESET,
)
