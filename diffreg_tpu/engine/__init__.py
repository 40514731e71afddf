from .checkpoint import CheckpointManager
from .loss_library import (as_rigid_as_possible_loss, chamfer_distance_loss,
                           p2p_fitting_regularizer,
                           hardest_contrastive_loss, orthogonal_loss,
                           sigmoid_focal_loss, sigmoid_focal_loss_with_logits,
                           smooth_cross_entropy_loss, transformation_loss,
                           weighted_bce_loss, weighted_bce_loss_with_logits)
from .losses import LossConfig, diffreg_loss, focal_correspondence_loss, match_recall_precision
from .tester import FourDMatchTester, TestConfig, ThreeDMatchTester
from .train import (OptimConfig, TrainState, create_train_state, make_eval_step,
                    make_optimizer, make_train_step, warmup_annealing_schedule)
from .trainer import (BatchTester, CycleIterator, IterBasedTrainer, Trainer,
                      TrainerConfig)

__all__ = [
    "LossConfig",
    "diffreg_loss",
    "focal_correspondence_loss",
    "match_recall_precision",
    "p2p_fitting_regularizer",
    "OptimConfig",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "warmup_annealing_schedule",
    "Trainer",
    "TrainerConfig",
    "BatchTester",
    "CycleIterator",
    "IterBasedTrainer",
    "CheckpointManager",
    "TestConfig",
    "ThreeDMatchTester",
    "FourDMatchTester",
    "as_rigid_as_possible_loss",
    "chamfer_distance_loss",
    "hardest_contrastive_loss",
    "orthogonal_loss",
    "sigmoid_focal_loss",
    "sigmoid_focal_loss_with_logits",
    "smooth_cross_entropy_loss",
    "transformation_loss",
    "weighted_bce_loss",
    "weighted_bce_loss_with_logits",
]
