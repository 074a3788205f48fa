from .bodymodel import BodyModel
from .bodyfitter import BodyFitter
from .bodyconverter import BodyConverter
from .bodyflipper import BodyFlipper
from .bodyfitter_opt import BodyFitterOpt
from .handreplacer import HandReplacer
from .bodyflipper_opt import BodyFlipperOpt
from .bodyfitter import fit_scale_and_translation
