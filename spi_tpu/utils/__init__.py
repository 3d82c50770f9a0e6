"""Utility modules: camera math, depth warping, image/checkpoint IO."""
