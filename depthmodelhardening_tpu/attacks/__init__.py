from .base import PhysObjAttack, PhysObjAttackConfig, SCENE_H, SCENE_W
from .pgd_image import PGDImageAttack
from .pgd_object import PGDObjectAttack
from .l0_object import L0ObjectAttack, default_l0_config
