from gcn_recommendation_tpu.train.loss import bpr_loss_reg

__all__ = ["bpr_loss_reg"]
