"""Dataset adapters: nuScenes devkit bridge, detection loading/matching,
synthetic scenes for CI, and modality feature extraction."""
