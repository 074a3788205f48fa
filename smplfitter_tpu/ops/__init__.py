from . import rotation, lstsq
