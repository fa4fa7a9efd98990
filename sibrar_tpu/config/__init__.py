from sibrar_tpu.config.loader import (
    extend_by_base_configs,
    load_config_dict,
    merge_dicts,
    nested_dict_get,
    parse_conf_file,
    save_config,
    update_nested_dict,
    yaml_save,
)
from sibrar_tpu.config.schema import (
    DataLoaderConfig,
    DatasetConfig,
    DatasetSplitType,
    EmbeddingRegularizationType,
    EvalConfig,
    ExperimentConfig,
    FeatureDefinition,
    FeatureType,
    LearningConfig,
    RunSettings,
    WandbConfig,
    as_dict,
    from_dict,
)

__all__ = [
    "extend_by_base_configs", "load_config_dict", "merge_dicts", "nested_dict_get",
    "parse_conf_file", "save_config", "update_nested_dict", "yaml_save",
    "DataLoaderConfig", "DatasetConfig", "DatasetSplitType",
    "EmbeddingRegularizationType", "EvalConfig", "ExperimentConfig",
    "FeatureDefinition", "FeatureType", "LearningConfig", "RunSettings",
    "WandbConfig", "as_dict", "from_dict",
]
