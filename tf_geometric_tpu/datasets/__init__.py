"""Dataset zoo (reference: datasets/__init__.py:2-16), plus synthetic
generators for offline tests/benchmarks."""
from .ppi import PPIDataset
from .tu import TUDataset
from .planetoid import (PlanetoidDataset, CoraDataset, CiteseerDataset,
                        PubmedDataset, SupervisedCoraDataset,
                        SupervisedCiteseerDataset, SupervisedPubmedDataset)
from .blog_catalog import MultiLabelBlogCatalogDataset
from .reddit import TransductiveRedditDataset, InductiveRedditDataset
from .ogb import OGBNodePropPredDataset
from .model_net import ModelNet10Dataset, ModelNet40Dataset
from .csr_npz import CSRNPZDataset
from .amazon_electronics import (AmazonElectronicsDataset,
                                 AmazonComputersDataset, AmazonPhotoDataset)
from .coauthor import CoauthorDataset, CoauthorCSDataset, CoauthorPhysicsDataset
from .abnormal import FDAmazonDataset, FDYelpChiDataset
from .hgb import (HGBDataset, HGBACMDataset, HGBDBLPDataset,
                  HGBFreebaseDataset, HGBIMDBDataset)
from .nars_academic import NARSACMDataset
from .synthetic_citation import (synthetic_citation_graph,
                                 synthetic_ogbn_arxiv_like,
                                 FakePlanetoidDataset)
