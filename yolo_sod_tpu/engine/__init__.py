"""Mode engines: model facade, predictor, trainer, validator, exporter."""
