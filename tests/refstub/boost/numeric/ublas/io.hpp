#pragma once  // io operators unused by the oracle
