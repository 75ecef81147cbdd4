from .grid_sample import sample_line, sample_plane, sample_volume
from .pdf import sample_pdf
from .pe import positional_encoding
from .sh import eval_sh, eval_sh_bases
from .volrend import raw2alpha, ray_entropy
