from .base import PhysObjAttack, PhysObjAttackConfig, SCENE_H, SCENE_W
from .pgd_image import PGDImageAttack
from .pgd_object import PGDObjectAttack
from .l0_object import L0ObjectAttack, default_l0_config
from .l2_object import L2ObjectAttack
from .apgd_object import APGDObjectAttack
from .square_object import SquareObjectAttack
from .light_object import LightObjectAttack
from .physical import PhysicalObjectAttack
from .random_object import (
    ArbiObjectAttack, GaussianObjectAttack, VanilaObjectAttack,
)
from . import classifier
from . import classifier_auto
