from abcsmc_tpu.ops import stats, weights, resample, ranking, pls

__all__ = ["stats", "weights", "resample", "ranking", "pls"]
